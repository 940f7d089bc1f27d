package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-defined scans (SURVEY S7; reference
  * `scripts/dbquery-container/queries.py`).
  *
  * The reference's three hand-written T-SQL extraction queries re-shaped
  * as ANSI Spark SQL over registered views (`persdata`, `attribute`,
  * `attribute_value`, `archive_schema`, `attribute_quality`, `val_nodes`).
  * The bracketed-identifier and TOP syntax of T-SQL becomes standard SQL;
  * the join/filter shapes are verbatim.
  */
object SqlScans {

  /** `qa_level_query` (queries.py:1-9): names above a QA level. */
  def qaLevelQuery(spark: SparkSession, limit: Int = 1000): DataFrame =
    spark.sql(
      s"""SELECT p.strLName
         |FROM persdata p
         |JOIN attribute_quality q
         |  ON p.lObjId = q.lObjId AND p.lCountId = q.lCountId
         |WHERE q.lAttTypeId = 1 AND q.lSubTypeNo = 1 AND q.strQLevel >= 4
         |LIMIT $limit""".stripMargin)

  /** `persdata_query` (queries.py:11-46): person rows + TD-number
    * attribute via the correlated attribute-value join + schema code.
    */
  def persdataQuery(spark: SparkSession): DataFrame =
    spark.sql(
      """SELECT schm.strSchemaCode, schm.lSchemaId, p.lObjId,
        |       p.strLName, p.lLNameType, p.strGName, p.lGNamePos,
        |       p.strDoB, p.lNumber, p.strPrisNo, p.lCountId,
        |       attr.strValue_l1 AS TDNumber
        |FROM persdata p
        |LEFT JOIN (
        |  SELECT a.lObjId, v.strValue_l1, a.lCountId
        |  FROM attribute a
        |  JOIN attribute_value v
        |    ON a.lValueId = v.lValueId AND a.lAttTypeId = v.lAttTypeId
        |   AND a.lSubTypeNo = v.lSubTypeNo
        |  WHERE v.lAttTypeId = 1 AND v.lSubTypeNo = 99 AND v.strValue_l1 != ''
        |) attr ON p.lObjId = attr.lObjId AND p.lCountId = attr.lCountId
        |LEFT JOIN archive_schema schm ON schm.lSchemaId = p.lSchemaId""".stripMargin)

  /** `bestand_query` (queries.py:48-80): one archive holding's persons
    * with birthplace and TD number attributes.
    */
  def bestandQuery(spark: SparkSession, bestandNr: String): DataFrame = {
    require(bestandNr.matches("[A-Za-z0-9_.-]+"), s"invalid bestand id: $bestandNr")
    spark.sql(
      s"""SELECT bestand.lSchemaId, p.lObjId, p.lCountId, p.strLName,
         |       p.lLNameType, p.strGName, p.strDoB,
         |       p.lNumber AS prisoner_number, pob.strPoB, tdnum.TD_number
         |FROM (
         |  SELECT val.lObjId, schm.strSchemaCode AS lSchemaId
         |  FROM val_nodes val
         |  JOIN archive_schema schm ON val.lSchemaId = schm.lSchemaId
         |  WHERE schm.strSchemaCode IN ('$bestandNr')
         |) bestand
         |JOIN persdata p ON p.lObjId = bestand.lObjId
         |LEFT JOIN (
         |  -- lValueId-only join with the type filter on aVal is the
         |  -- reference's own shape (dbquery-container/queries.py:71-78);
         |  -- the 3-column join belongs to the persdata query only.
         |  -- Reproduced bug-for-bug: S7's contract is the reference SQL.
         |  SELECT attr.lObjId, attr.lCountId, aVal.strValue_l1 AS strPoB
         |  FROM attribute attr
         |  JOIN attribute_value aVal ON attr.lValueId = aVal.lValueId
         |  WHERE aVal.lAttTypeId = 1 AND aVal.lSubTypeNo = 8
         |) pob ON p.lObjId = pob.lObjId AND p.lCountId = pob.lCountId
         |LEFT JOIN (
         |  SELECT attr.lObjId, attr.lCountId, aVal.strValue_l1 AS TD_number
         |  FROM attribute attr
         |  JOIN attribute_value aVal ON attr.lValueId = aVal.lValueId
         |  WHERE aVal.lAttTypeId = 1 AND aVal.lSubTypeNo = 99
         |) tdnum ON p.lObjId = tdnum.lObjId AND p.lCountId = tdnum.lCountId""".stripMargin)
  }
}
