package graft.json

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A JSON Merge Patch document (RFC 7386), expressed structurally so
  * no string parsing happens at plan-build time: `Remove` is the RFC's
  * JSON null, `Set` replaces a member with a literal/derived value,
  * `Obj` recurses into (or creates) a nested object. */
sealed trait Patch
object Patch {
  case object Remove extends Patch
  final case class Set(v: Column) extends Patch
  final case class Obj(fields: Seq[(String, Patch)]) extends Patch
}

/** Schema-driven RFC 7386 JSON MERGE PATCH over document columns — the
  * field-level document mutation verb beside [[graft.ops.JsonQueries
  * .qJsonPatch]]'s RFC 6902 ops. The reference mutates documents only
  * by whole-row upsert (DatabaseManager.java:211-229,391-447); merge
  * patch is the declarative partial-update a JSON store's user writes.
  *
  * Semantics (RFC 7386): a patch member whose value is null REMOVES
  * the target member; an object value merges RECURSIVELY (a missing or
  * non-object target is treated as {}); any other value REPLACES the
  * target. Patch members absent from the document schema are APPENDED
  * (the engine family's `assertColumn` schema-evolution analogue).
  *
  * Implementation: the document parses once against its read schema,
  * the merged STRUCT is built as a pure projection (one expression
  * tree per patch — no UDF, no per-row interpretation beyond the JSON
  * parse Spark already does), and `to_json` drops null fields, which
  * IS the remove semantics on the wire. Map-only at any corpus size.
  * The gate oracle replays the same patches through DuckDB's NATIVE
  * `json_merge_patch` — an independent RFC 7386 implementation the
  * census must match value-for-value. */
object MergePatch {

  /** Merged struct column: `doc` (a struct of `schema`) patched by
    * `patch`. */
  def merged(doc: Column, schema: StructType,
      patch: Seq[(String, Patch)]): Column = {
    val pm = patch.toMap
    val existing: Seq[Column] = schema.fields.toSeq.map { f =>
      pm.get(f.name) match {
        case None                   => doc.getField(f.name).as(f.name)
        case Some(Patch.Remove)     => lit(null).cast(f.dataType).as(f.name)
        case Some(Patch.Set(v))     => v.as(f.name)
        case Some(Patch.Obj(sub)) => f.dataType match {
          case st: StructType => merged(doc.getField(f.name), st, sub).as(f.name)
          // RFC: recursing into a non-object target merges into {}
          case _ => fromPatch(sub).as(f.name)
        }
      }
    }
    val added: Seq[Column] = patch.collect {
      case (n, p) if !schema.fieldNames.contains(n) => p match {
        case Patch.Remove   => None // removing an absent member: no-op
        case Patch.Set(v)   => Some(v.as(n))
        case Patch.Obj(sub) => Some(fromPatch(sub).as(n))
      }
    }.flatten
    struct(existing ++ added: _*)
  }

  /** The object a patch builds when its target is absent: Set/Obj
    * members materialize, Remove members vanish. */
  private def fromPatch(p: Seq[(String, Patch)]): Column = {
    val fields = p.flatMap {
      case (_, Patch.Remove)   => None
      case (n, Patch.Set(v))   => Some(v.as(n))
      case (n, Patch.Obj(sub)) => Some(fromPatch(sub).as(n))
    }
    require(fields.nonEmpty, "merge patch builds an empty object")
    struct(fields: _*)
  }

  /** JSON-text in, JSON-text out: parse against `schema`, merge, and
    * re-serialize (null fields dropped — the RFC remove on the wire). */
  def apply(docJson: Column, schema: StructType,
      patch: Seq[(String, Patch)]): Column =
    to_json(merged(from_json(docJson, schema), schema, patch))
}
