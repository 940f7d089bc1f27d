package graft.unpack

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zooniverse annotation parsing (SURVEY X2; reference
  * `src/aroa_etl/zooniverse/unpacking.py`).
  *
  * Annotations arrive as a JSON task list; each task is either a simple
  * `{task, task_label, value}` or a parent task whose `value` holds
  * sub-annotations (dropdown pairs `{value: [{label}]}` + `{value}`, and
  * single-`select_label` "empty" tasks that consume their value task).
  *
  * Dispatch mirrors the reference's embedded Draft-7 schemas exactly,
  * including their permissiveness (schema `properties` without
  * `required` accept objects missing the property) and their ordering
  * (parent → simple → null at the top level; simple → empty → dropdown
  * inside a parent). A task matching NO schema raises an explicit
  * diagnostic — the reference `assert False`s there (`unpacking.py:53,
  * 72`); a malformed export must fail loudly, not cascade nulls.
  */
object Zooniverse {

  final class MalformedAnnotationException(msg: String)
    extends IllegalArgumentException(msg)

  private def fail(what: String, n: JsonNode): Nothing =
    throw new MalformedAnnotationException(s"$what: $n")

  private def isStr(n: JsonNode, f: String): Boolean =
    !n.has(f) || n.get(f).isTextual
  private def strField(n: JsonNode, f: String, ctx: String): String = {
    val v = n.get(f)
    if (v == null || !v.isTextual) fail(s"$ctx: missing/non-string '$f'", n)
    v.asText
  }

  /** `__task_with_additional_annotations_schema` (unpacking.py:6-20):
    * object; `task`/`name` strings if present; `task_label` null if
    * present; `value` an array of objects whose `task` is a string.
    */
  private def isParentTask(n: JsonNode): Boolean =
    n.isObject && isStr(n, "task") && isStr(n, "name") &&
      (!n.has("task_label") || n.get("task_label").isNull) &&
      (!n.has("value") || (n.get("value").isArray && {
        val it = n.get("value").elements()
        var ok = true
        while (ok && it.hasNext) { val e = it.next(); ok = e.isObject && isStr(e, "task") }
        ok
      }))

  /** `__simple_task_schema` (unpacking.py:34): object; `value` a string
    * if present.
    */
  private def isSimpleTask(n: JsonNode): Boolean =
    n.isObject && (!n.has("value") || n.get("value").isTextual)

  /** `__empty_task_schema` (unpacking.py:22-26): object; `value` an array
    * of EXACTLY one object with no property other than `select_label`
    * (string if present).
    */
  private def isEmptyTask(n: JsonNode): Boolean =
    n.isObject && (!n.has("value") || (n.get("value").isArray &&
      n.get("value").size() == 1 && {
        val item = n.get("value").get(0)
        item.isObject && isStr(item, "select_label") && {
          val names = item.fieldNames()
          var ok = true
          while (ok && names.hasNext) ok = names.next() == "select_label"
          ok
        }
      }))

  /** `__dropdown_task_schema` (unpacking.py:27-33): object; `value` an
    * array of EXACTLY one object whose `value`/`select_label` are strings
    * if present (other properties allowed — the processor then reads the
    * un-schema'd `label` property, a reference quirk kept verbatim).
    */
  private def isDropdownTask(n: JsonNode): Boolean =
    n.isObject && (!n.has("value") || (n.get("value").isArray &&
      n.get("value").size() == 1 && {
        val item = n.get("value").get(0)
        item.isObject && isStr(item, "value") && isStr(item, "select_label")
      }))

  /** `__process_simple_task` (unpacking.py:61-63): requires a non-empty
    * `task_label` (reference asserts) and a `value` (reference KeyErrors).
    */
  private def processSimple(n: JsonNode): (String, String) = {
    val label = strField(n, "task_label", "simple task without label")
    if (label.isEmpty) fail("simple task without label", n)
    val v = n.get("value")
    if (v == null || !v.isTextual) fail("simple task without value", n)
    label -> v.asText
  }

  /** `__process_task_with_additional_annotations` (unpacking.py:36-54):
    * consume the sub-task queue front-to-back; empty tasks swallow their
    * following value task, dropdown tasks pair with theirs.
    */
  private def processParent(
      task: JsonNode, out: collection.mutable.LinkedHashMap[String, String]): Unit = {
    val parent = strField(task, "task", "parent task without 'task'")
    val valueNode = task.get("value")
    if (valueNode == null) fail("parent task without 'value'", task)
    import scala.jdk.CollectionConverters._
    val subs = valueNode.elements().asScala.toVector
    var i = 0
    while (i < subs.length) {
      val sub = subs(i)
      if (isSimpleTask(sub)) {
        val (lbl, v) = processSimple(sub)
        out(s"$parent: $lbl") = v
        i += 1
      } else if (isEmptyTask(sub)) {
        // reference pops (and discards) the empty task's value task;
        // popping from an exhausted queue IndexErrors there
        if (i + 1 >= subs.length) fail("empty task without a following value task", sub)
        i += 2
      } else if (isDropdownTask(sub)) {
        if (i + 1 >= subs.length) fail("dropdown task without a following value task", sub)
        val item = sub.get("value").get(0)
        // the reference reads `label` (NOT the schema'd select_label)
        val label = strField(item, "label", "dropdown item without 'label'")
        val valueTask = subs(i + 1)
        val v = valueTask.get("value")
        // the value task is never schema-validated by the reference;
        // accept any scalar rendering, but require presence
        if (v == null || v.isNull || v.isContainerNode)
          fail("dropdown value task without scalar 'value'", valueTask)
        out(s"$parent: $label") = v.asText
        i += 2
      } else fail("neither task_types apply", sub)
    }
  }

  /** Parse one annotations JSON document to (label → value) pairs.
    * Null/absent input is the reference's NaN → empty dict; malformed
    * JSON or a task matching no schema throws
    * [[MalformedAnnotationException]] with the offending node.
    */
  // shared: ObjectMapper construction is a heavyweight allocation and
  // readTree is thread-safe — one per JVM, not one per ROW inside the
  // parse UDF (the ColMatcher regex-hoist precedent)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parseAnnotations(json: String): Map[String, String] = {
    if (json == null) return Map.empty
    val root =
      try mapper.readTree(json)
      catch { case e: Exception =>
        throw new MalformedAnnotationException(
          s"annotations are not valid JSON (${e.getMessage}): $json")
      }
    if (root == null || root.isNull) return Map.empty
    if (!root.isArray) fail("annotations are not a task list", root)
    val out = collection.mutable.LinkedHashMap.empty[String, String]
    import scala.jdk.CollectionConverters._
    for (task <- root.elements().asScala) {
      // dispatch order is the reference's: parent → simple → null → error
      if (isParentTask(task)) processParent(task, out)
      else if (isSimpleTask(task)) { val (l, v) = processSimple(task); out(l) = v }
      else if (task.isNull) ()
      else fail("not a valid task instance", task)
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
