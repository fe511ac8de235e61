package graft.json

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.get_json_object

/** RFC 6901 JSON Pointer evaluation over JSON-string columns —
  * reference-core growth beside [[MergePatch]] (RFC 7386): the
  * pointer grammar (`/a~1b/0`, `~0`→`~`, `~1`→`/`) translated to the
  * Spark JSONPath `get_json_object` dialect at PLAN TIME, so
  * evaluation is the built-in codegen'd path extractor — no UDF. The
  * DuckDB oracle evaluates the RAW pointer through its native
  * JSONPointer support, so the gate certifies two independent
  * pointer implementations agree.
  *
  * One documented divergence from the RFC: an all-digit segment is
  * treated as an ARRAY index (JSONPath `[n]`) — numeric OBJECT keys
  * would need schema knowledge to disambiguate, which a path string
  * alone cannot carry.
  */
object JsonPointer {

  /** `/a~1b/meta/0` → `$['a/b']['meta'][0]` (get_json_object dialect). */
  def toJsonPath(pointer: String): String = {
    require(pointer.isEmpty || pointer.startsWith("/"),
      s"invalid RFC 6901 pointer: $pointer")
    val segs = if (pointer.isEmpty) Seq.empty[String]
    else pointer.drop(1).split("/", -1).toSeq
      .map(_.replace("~1", "/").replace("~0", "~"))
    segs.foldLeft("$") { (acc, seg) =>
      if (seg.nonEmpty && seg.forall(_.isDigit)) s"$acc[${seg.toInt}]"
      else s"$acc['${seg.replace("'", "\\'")}']"
    }
  }

  /** Evaluate the pointer against a JSON string column (null when the
    * pointer does not resolve — RFC "not found" maps to SQL NULL). */
  def get(doc: Column, pointer: String): Column =
    get_json_object(doc, toJsonPath(pointer))
}
