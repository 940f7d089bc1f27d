package graft

import java.sql.DriverManager
import graft.sources.{Jdbc, SqlScans}

/** S4 JDBC partitioned scan against an embedded Derby database (the
  * Derby jars ship with the Spark distribution, so the driver is on the
  * same unmanaged classpath the engine runs on). Seeds the S7 table
  * shapes, then asserts (1) the partitioned read really splits into the
  * requested ranges and returns exactly the seeded rows, and (2) the
  * reference's three SQL-defined scans produce identical results over
  * JDBC-backed views as over native views.
  */
class JdbcSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftdb"
  private val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url + ";create=true")
    val st = conn.createStatement()
    st.execute("""CREATE TABLE persdata (
      lObjId BIGINT, lCountId BIGINT, strLName VARCHAR(64), lLNameType INT,
      strGName VARCHAR(64), lGNamePos INT, strDoB VARCHAR(16), lNumber BIGINT,
      strPrisNo VARCHAR(16), lSchemaId BIGINT)""")
    st.execute("CREATE TABLE attribute (lObjId BIGINT, lCountId BIGINT, lAttTypeId INT, lSubTypeNo INT, lValueId BIGINT)")
    st.execute("CREATE TABLE attribute_value (lValueId BIGINT, lAttTypeId INT, lSubTypeNo INT, strValue_l1 VARCHAR(64))")
    st.execute("CREATE TABLE archive_schema (lSchemaId BIGINT, strSchemaCode VARCHAR(16))")
    st.execute("CREATE TABLE attribute_quality (lObjId BIGINT, lCountId BIGINT, lAttTypeId INT, lSubTypeNo INT, strQLevel INT)")
    st.execute("CREATE TABLE val_nodes (lObjId BIGINT, lSchemaId BIGINT)")
    val ins = conn.prepareStatement("INSERT INTO persdata VALUES (?,?,?,?,?,?,?,?,?,?)")
    for (i <- 1 to 100) {
      ins.setLong(1, i.toLong); ins.setLong(2, 1L); ins.setString(3, s"Name$i")
      ins.setInt(4, 1); ins.setString(5, s"Given$i"); ins.setInt(6, 1)
      ins.setString(7, "19430312"); ins.setLong(8, 100L + i); ins.setString(9, i.toString)
      ins.setLong(10, 5L)
      ins.addBatch()
    }
    ins.executeBatch()
    st.execute("INSERT INTO attribute VALUES (1, 1, 1, 99, 10)")
    st.execute("INSERT INTO attribute_value VALUES (10, 1, 99, 'TD77')")
    st.execute("INSERT INTO archive_schema VALUES (5, 'B100')")
    st.execute("INSERT INTO attribute_quality VALUES (1, 1, 1, 1, 5)")
    st.execute("INSERT INTO val_nodes VALUES (1, 5)")
    conn.close()
  }

  test("partitioned JDBC scan splits into range partitions and returns all rows") {
    seeded
    val df = Jdbc.read(spark, Jdbc.JdbcScan(
      url = url, table = "persdata", partitionColumn = "lObjId",
      lowerBound = 1L, upperBound = 101L, numPartitions = 4, properties = props))
    assert(df.rdd.getNumPartitions === 4, "ranges must fan out to 4 partitions")
    val rows = df.collect()
    assert(rows.length === 100)
    // no partition boundary drops or duplicates: ids are exactly 1..100
    assert(rows.map(_.getAs[Long]("LOBJID")).sorted.toSeq === (1L to 100L))
    // every partition pulled a non-empty slice of the range
    val perPartition = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPartition.forall(_ > 0) && perPartition.sum === 100)
  }

  test("predicate and projection push down into the JDBC scan itself") {
    seeded
    import org.apache.spark.sql.functions.col
    val df = Jdbc.read(spark, Jdbc.JdbcScan(
        url = url, table = "persdata", partitionColumn = "lObjId",
        lowerBound = 1L, upperBound = 101L, numPartitions = 4, properties = props))
      .filter(col("LOBJID") > 50L)
      .select(col("LOBJID"), col("STRLNAME"))
    // the filter must reach the JDBC relation's scan metadata — i.e. be
    // executed database-side in the generated WHERE clause, not in Spark
    // after a full-table fetch (the 100 TB story: ship predicates to the
    // store, pull only matching rows over the wire)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters"), s"no pushdown metadata in scan:\n$scan")
    assert(scan.contains("GreaterThan(LOBJID,50)"), s"partition-column filter not pushed:\n$scan")
    // projection pruning: unreferenced columns never leave the database
    assert(!scan.contains("STRGNAME"), s"unreferenced column fetched:\n$scan")
    // and the pushed plan still computes the right answer
    assert(df.count() === 50)
  }

  test("S7 scans over JDBC-backed views match the reference shapes") {
    seeded
    def view(table: String): Unit =
      Jdbc.read(spark, Jdbc.JdbcScan(url, table, "lObjId", 1L, 101L,
        numPartitions = 2, properties = props))
        .createOrReplaceTempView(table)
    Seq("persdata", "attribute", "attribute_quality", "val_nodes").foreach(view)
    // tables without lObjId read unpartitioned (small dimension shape)
    spark.read.format("jdbc").option("url", url)
      .option("driver", props("driver"))
      .option("dbtable", "attribute_value").load()
      .createOrReplaceTempView("attribute_value")
    spark.read.format("jdbc").option("url", url)
      .option("driver", props("driver"))
      .option("dbtable", "archive_schema").load()
      .createOrReplaceTempView("archive_schema")

    assert(SqlScans.qaLevelQuery(spark).collect().map(_.getString(0)).toSeq === Seq("Name1"))
    val pd = SqlScans.persdataQuery(spark).collect()
    assert(pd.length === 100)
    val byId = pd.map(r => r.getAs[Long]("lObjId") -> r).toMap
    assert(byId(1L).getAs[String]("TDNumber") === "TD77")
    assert(byId(2L).getAs[String]("TDNumber") === null)
    assert(byId(1L).getAs[String]("strSchemaCode") === "B100")
    val b = SqlScans.bestandQuery(spark, "B100").collect()
    assert(b.length === 1)
    assert(b.head.getAs[String]("TD_number") === "TD77")
    assert(b.head.getAs[String]("strLName") === "Name1")
  }
}
