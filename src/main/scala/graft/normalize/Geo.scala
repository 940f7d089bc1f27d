package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wikidata / geonames ID parsing (SURVEY F20; reference
  * `column_processing.py:1338-1421`).
  *
  * Note: the reference flags `qa | parsed != original` with Python's
  * `|`-before-`!=` precedence, which ors the QA bool into the string
  * column; the intended semantics (flag when parsing changed the value)
  * are implemented here.
  */
object Geo {
  private val UnclearRegex = "[uU][nN][cC][lL][eE][aA][rR]|[uU][nN][kK][lL][aA][rR]"

  /** `Q123`/`q123`/bare digits → `Q123`; anything else → empty + QA. */
  def parseWikidataId(c: Column): Column = {
    val t = Clean.pyStrip(coalesce(c, lit("")))
    when(t.rlike("^[qQ]\\d+$"), t)
      .when(t.rlike("^\\d+$"), concat(lit("Q"), t))
      .otherwise(lit(""))
  }

  def cleanWikidataIds(df: DataFrame, wikiCol: String): DataFrame = {
    val raw = coalesce(col(wikiCol).cast("string"), lit(""))
    val parsed = parseWikidataId(raw)
    df.withColumn(s"${wikiCol}_qa",
        Clean.createQaCol(raw, UnclearRegex, Regexes.QaNoEntry) || parsed =!= raw)
      .withColumn(wikiCol, parsed)
  }

  /** Bare digits pass; anything else → empty + QA. */
  def parseGeonameId(c: Column): Column = {
    val t = Clean.pyStrip(coalesce(c, lit("")))
    when(t.rlike("^\\d+$"), t).otherwise(lit(""))
  }

  def cleanGeonameIds(df: DataFrame, geoCol: String): DataFrame = {
    val raw = coalesce(col(geoCol).cast("string"), lit(""))
    val parsed = parseGeonameId(raw)
    df.withColumn(s"${geoCol}_qa",
        Clean.createQaCol(raw, UnclearRegex, Regexes.QaNoEntry) || parsed =!= raw)
      .withColumn(geoCol, parsed)
  }
}
