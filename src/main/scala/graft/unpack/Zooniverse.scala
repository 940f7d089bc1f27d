package graft.unpack

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zooniverse annotation parsing (SURVEY X2; reference
  * `src/aroa_etl/zooniverse/unpacking.py`).
  *
  * Annotations arrive as a JSON task list; each task is either a simple
  * `{task, task_label, value}` or a parent task whose `value` holds
  * sub-annotations (dropdown pairs `{value: [{label}]}` + `{value}`).
  * The parser flattens them to a `label → value` map per row — the
  * schema-dispatch of the reference expressed as shape tests on the
  * parsed JSON. (Minimal port: simple + nested simple + dropdown pair;
  * JSON-Schema validation is structural here.)
  */
object Zooniverse {

  private type JMap = Map[String, String]

  /** Parse one annotations JSON document to (label → value) pairs. */
  def parseAnnotations(json: String): Map[String, String] = {
    if (json == null) return Map.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = try mapper.readTree(json) catch { case _: Exception => return Map.empty }
    if (!root.isArray) return Map.empty
    val out = collection.mutable.LinkedHashMap.empty[String, String]

    def text(n: com.fasterxml.jackson.databind.JsonNode, f: String): Option[String] =
      Option(n.get(f)).filter(x => x.isTextual || x.isNumber).map(_.asText)

    import scala.jdk.CollectionConverters._
    for (task <- root.elements().asScala) {
      val valueNode = task.get("value")
      if (valueNode != null && valueNode.isTextual) {
        // simple task
        text(task, "task_label").foreach(lbl => out(lbl) = valueNode.asText)
      } else if (valueNode != null && valueNode.isArray) {
        // parent task with sub-annotations
        val parent = text(task, "task").getOrElse("")
        val subs = valueNode.elements().asScala.toVector
        var i = 0
        while (i < subs.length) {
          val sub = subs(i)
          val subValue = sub.get("value")
          if (subValue != null && subValue.isTextual) {
            text(sub, "task_label").foreach { lbl =>
              out(s"$parent: $lbl") = subValue.asText
            }
            i += 1
          } else if (subValue != null && subValue.isArray && subValue.size() == 1 &&
            subValue.get(0).has("label") && i + 1 < subs.length) {
            // dropdown pair: {value:[{label}]} followed by {value}
            val label = subValue.get(0).get("label").asText
            val next = subs(i + 1)
            text(next, "value").foreach(v => out(s"$parent: $label") = v)
            i += 2
          } else i += 1
        }
      }
    }
    out.toMap
  }

  val parseAnnotationsUdf = udf(parseAnnotations _)

  /** Flatten an annotations column into a map column (use `element_at`
    * or [[Unpack]]-style numbered-column projection downstream).
    */
  def withParsedAnnotations(df: DataFrame, annotationsCol: String,
      out: String = "annotations_map"): DataFrame =
    df.withColumn(out, parseAnnotationsUdf(col(annotationsCol)))
}
