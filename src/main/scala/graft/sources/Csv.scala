package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV source/sink (SURVEY S1/S6).
  *
  * Every reference entry point reads `,`- or `|`-separated CSV with an
  * all-string schema (`pd.read_csv(..., dtype=str)` —
  * `run_clustering.py:26`, `run-matching.py:31`); stages write the same
  * shape back (`run-matching.py:69-72`). Spark's CSV reader keeps all
  * columns as strings when schema inference is off, which is exactly the
  * reference's dtype=str contract.
  */
object Csv {
  /** All-string CSV scan. `indexCol=true` mirrors `index_col=0`: the
    * leading unnamed pandas index column becomes `row_id: long` (the
    * explicit row identity every downstream stage joins on).
    */
  def readStrings(
      spark: SparkSession,
      path: String,
      sep: String = ",",
      indexCol: Boolean = false): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", "")
      // RFC4180 doubled-quote escaping (the pandas to_csv/read_csv
      // default); Spark's own default escape is backslash.
      .option("escape", "\"")
      .csv(path)
    if (indexCol) {
      val first = df.columns.head
      df.withColumnRenamed(first, "row_id")
        .withColumn("row_id", org.apache.spark.sql.functions.col("row_id").cast("long"))
    } else df
  }

  /** pandas' default NA sentinel set (`read_csv` without `keep_default_na
    * =False` turns these strings into NaN). The reference's stage chain
    * round-trips every stage through CSV, so literal "None"/"NA" strings
    * written by one stage arrive as missing at the next — semantics that
    * matter (e.g. unpack's python-str "None" cells).
    */
  val PandasNaValues: Seq[String] = Seq(
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null")

  /** Convert pandas-default NA strings to real nulls on every string
    * column — one select (a withColumn fold is quadratic analyzer work).
    */
  def pandasNaToNull(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name).toSet
    df.select(df.columns.map { c =>
      if (strCols.contains(c))
        when(col(c).isin(PandasNaValues: _*), lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }.toIndexedSeq: _*)
  }

  /** Stage sink (`to_csv(sep="|")` shape). One directory of part files —
    * no `coalesce(1)`: serializing through one task is the anti-pattern
    * the engine avoids at scale.
    */
  def write(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.option("header", "true").option("sep", sep).mode("overwrite").csv(path)
}

/** Classpath fixture access: materializes a resource to a DETERMINISTIC
  * file (`$tmpdir/graftfixtures/<name>`) so Spark's file-based readers
  * can scan it regardless of working directory — and so oracle SQL that
  * embeds the path (q16's DuckDB `read_csv` replay, executed by the
  * driver after Verify exits) finds the same bytes Spark scanned.
  * Written via temp-file + atomic move: concurrent callers (tests) never
  * observe a torn file.
  */
object Fixtures {
  // per-user directory: a world-shared fixed path would let another
  // local user pre-create it (EPERM) or substitute bytes that feed the
  // q16 DuckDB oracle. The user-name suffix keeps users apart; the
  // ownership check below catches a squatter who guessed the name.
  private val dir = java.nio.file.Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    s"graftfixtures-${sys.props.getOrElse("user.name", "unknown")}")

  def path(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graftfixtures/$name")
    require(in != null, s"fixture $name not on classpath")
    java.nio.file.Files.createDirectories(dir)
    val owner = java.nio.file.Files.getOwner(dir).getName
    val me = sys.props.getOrElse("user.name", owner)
    require(owner == me,
      s"fixture dir $dir is owned by '$owner', not '$me' — refusing to " +
        "write oracle-fed fixtures into a directory another user controls")
    val tmp = java.nio.file.Files.createTempFile(dir, s".$name.", ".part")
    try java.nio.file.Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    // pandas `to_csv(index=True)` leaves the index header blank; Spark's
    // header-vs-schema check then logs a spurious `Expected: _c0` error on
    // every scan. Name it here — `readStrings(indexCol = true)` renames
    // the first column to row_id regardless.
    if (name.endsWith(".csv")) {
      val text = java.nio.file.Files.readString(tmp)
      if (text.startsWith(","))
        java.nio.file.Files.writeString(tmp, "row_id" + text)
    }
    val target = dir.resolve(name)
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // NO deleteOnExit: the driver's DuckDB oracle reads this path AFTER
    // the Verify JVM exits. A few KB under $tmpdir, overwritten per run.
    target.toString
  }
}
