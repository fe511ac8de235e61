package graft.json

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON → relational normalization, the Spark re-expression of the
  * reference's `saveIntoDatabase` (DatabaseManager.java:118-241).
  *
  * The reference walks one JSON object at a time, issuing DDL/DML per
  * node. Here the same shredding rules are applied to *columns* of
  * documents at once — a narrow, shuffle-free map over the whole corpus:
  *
  *  - child object carrying the key field → own table + numeric FK in
  *    the parent (reference: `{child:<id>}` marker, java:145-155,453-474)
  *  - key-less object of primitives → flattened `parent$sub` columns
  *    (java:156-167)
  *  - array of objects → child table whose FK column is named after the
  *    parent table (java:168-202,231-238)
  *  - array of primitives → stored as one JSON-text column (java:187-193)
  *
  * Deviation from the reference, deliberately Spark-first: references are
  * stored as typed numeric FKs, not `{child:n}` strings — joins stay
  * codegen'd and statistics-friendly.
  */
object Shred {

  /** Parse a JSON string column with an explicit schema and lift its
    * fields to top-level columns. Flat shredding (reference's primitive
    * path). */
  def flatten(df: DataFrame, jsonCol: String, schema: StructType,
      keep: Seq[String] = Nil): DataFrame = {
    val parsed = df.withColumn("_doc", from_json(col(jsonCol), schema))
    val lifted = schema.fieldNames.map(f => col(s"_doc.$f").as(f))
    parsed.select((keep.map(col) ++ lifted): _*)
  }

  /** Parent→child relation discovered by [[normalize]]: `ChildObject`
    * means the parent keeps a numeric FK column named `child` pointing
    * at the child table's key; `ChildArray` means the child table
    * carries an FK column named after the parent. */
  sealed trait Rel { def parent: String; def child: String }
  case class ChildObject(parent: String, child: String) extends Rel
  case class ChildArray(parent: String, child: String) extends Rel

  /** 2-d primitive array (array<array<prim>>) shredded to a POSITIONAL
    * child table `(parentFK, pos, ipos, value)` — one row per scalar
    * cell, both indices explicit so re-assembly restores exact order.
    * This closes the reference's own unshipped TODO
    * (DatabaseManager.java:172: nested arrays have no child-table
    * path there at all). EMPTY inner arrays (and empty matrices) leave
    * no cell rows and so do not survive the roundtrip — the same
    * elision the shred applies to absent fields. */
  case class ChildArray2(parent: String, child: String) extends Rel

  /** Recursively normalize a DataFrame of (already-parsed) nested
    * documents into a map of flat tables, applying the reference's
    * shredding rules. `key` is the identity field (reference: "rowNum").
    */
  def normalize(docs: DataFrame, rootName: String,
      key: String = "rowNum"): Map[String, DataFrame] =
    normalizeWithRelations(docs, rootName, key)._1

  /** Same, also returning the parent→child relation list so callers
    * (e.g. graft.Engine) can re-assemble arbitrarily deep documents. */
  def normalizeWithRelations(docs: DataFrame, rootName: String,
      key: String = "rowNum"): (Map[String, DataFrame], Seq[Rel]) = {
    var root = docs
    var out = Map.empty[String, DataFrame]
    var rels = Seq.empty[Rel]
    docs.schema.fields.foreach { f =>
      f.dataType match {
        case st: StructType if st.fieldNames.contains(key) =>
          // identity-bearing child object → own table, numeric FK back
          val child = docs.select(col(s"${f.name}.*"))
          val (t, r) = normalizeWithRelations(child, f.name, key)
          out ++= t
          rels ++= (ChildObject(rootName, f.name) +: r)
          root = root.withColumn(f.name, col(s"${f.name}.$key"))
        case st: StructType =>
          // key-less primitive object → parent$sub columns
          st.fieldNames.foreach { sub =>
            root = root.withColumn(s"${f.name}$$$sub", col(s"${f.name}.$sub"))
          }
          root = root.drop(f.name)
        case ArrayType(_: StructType, _) =>
          // array of objects → child table, FK column named after parent
          val child = docs
            .select(col(key).as(rootName), explode(col(f.name)).as("_c"))
            .select(col(rootName), col("_c.*"))
          val (t, r) = normalizeWithRelations(child, f.name, key)
          out ++= t
          rels ++= (ChildArray(rootName, f.name) +: r)
          root = root.drop(f.name)
        case ArrayType(ArrayType(inner, _), _)
            if !inner.isInstanceOf[StructType] =>
          // array of arrays of primitives → positional child table
          // (parentFK, pos, ipos, value): one row per scalar cell; a
          // double posexplode (two selects — generators cannot nest)
          // is a narrow shuffle-free map like every other shred rule
          val cells = docs
            .select(col(key).as(rootName),
              posexplode(col(f.name)).as(Seq("pos", "_inner")))
            .select(col(rootName), col("pos"),
              posexplode(col("_inner")).as(Seq("ipos", "value")))
          out += (f.name -> cells)
          rels :+= ChildArray2(rootName, f.name)
          root = root.drop(f.name)
        case ArrayType(_, _) =>
          // primitive array → JSON-text column
          root = root.withColumn(f.name, to_json(col(f.name)))
        case _ => ()
      }
    }
    (out + (rootName -> root), rels)
  }

  /** Heterogeneous child arrays: the reference allows one array to mix
    * object types, routed to per-`type` child tables
    * (DatabaseManager.java:175-201). Spark arrays are homogeneous, so
    * mixed children travel as array<struct<type:string,json:string>>;
    * this splits them into one table per declared type, parsing each
    * type's JSON payload with its own schema. Rows with undeclared
    * types are dropped (the reference logs and skips them too,
    * java:180-183). */
  def normalizeTyped(docs: DataFrame, arrayCol: String, key: String,
      rootName: String, schemas: Map[String, StructType]): Map[String, DataFrame] = {
    val exploded = docs
      .select(col(key).as(rootName), explode(col(arrayCol)).as("_c"))
      .select(col(rootName), col("_c.type").as("_t"), col("_c.json").as("_j"))
    schemas.map { case (tpe, schema) =>
      tpe -> exploded
        .filter(col("_t") === tpe)
        .withColumn("_doc", from_json(col("_j"), schema))
        .select(col(rootName) +: schema.fieldNames.map(f => col(s"_doc.$f")): _*)
    }
  }

  /** Reference `getType` (DatabaseManager.java:514-534) as a codegen'd
    * column expression over a (name, value-as-string) pair:
    * numeric literal → NUMBER; name mentions "time" and value looks
    * ISO-ish → DATE; short → MEDIUM_STRING; else TEXT.
    *
    * Numeric includes decimals: the reference classifies via Gson's
    * `getAsInt`, which accepts non-integer numerics (12.5 → 12, no
    * exception), so "12.5" is NUMBER there too. Scientific notation is
    * out of scope on both sides (the reference's JSON writer never
    * emits it for the values it stores). */
  def inferType(name: Column, value: Column): Column =
    when(value.rlike("^-?[0-9]+(\\.[0-9]+)?$"), "NUMBER")
      .when(lower(name).contains("time") &&
        value.contains(":") && value.contains("T"), "DATE")
      .when(length(value) < 128, "MEDIUM_STRING")
      .otherwise("TEXT")
}
