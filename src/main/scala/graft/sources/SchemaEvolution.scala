package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Schema-evolution gate — the contract check between a producer's new
  * snapshot and its consumers, run BEFORE a refresh lands: which
  * columns were added, dropped, retyped or re-nulled, and is the step
  * backward-compatible (old readers still work on new data)?
  *
  * Everything here is driver-side metadata (two `StructType`s — for
  * parquet, read from footers without touching data rows), so the gate
  * costs nothing at any table size. Nested structs recurse with
  * dotted paths; arrays/maps compare element/key/value types.
  *
  * Compatibility verdicts follow the usual reader rules:
  *  - `added` nullable column → backward-compatible (old readers
  *    ignore it); `added` NON-nullable is flagged: consumers that
  *    write the table back cannot supply it.
  *  - `dropped` column → breaking for any consumer that selects it.
  *  - `retyped` → breaking unless a safe widening (the fixed list
  *    below: int→long, float→double, int/long→double, decimal
  *    precision growth at equal scale) — the widenings parquet readers
  *    and Spark's own schema merge accept.
  *  - `nullable-tightened` (nullable → required) is fine for readers;
  *    `nullable-loosened` (required → nullable) is flagged: downstream
  *    code may assume non-null.
  * SchemaEvolutionSpec pins each class, the nested/dotted cases, and
  * the safe-widening list both ways.
  */
object SchemaEvolution {

  /** One schema change: kind ∈ added | dropped | retyped |
    * nullable-loosened | nullable-tightened, with a breaking verdict.
    */
  final case class Change(kind: String, path: String, detail: String,
      breaking: Boolean)

  private def safeWidening(from: DataType, to: DataType): Boolean =
    (from.typeName, to.typeName) match {
      case ("integer", "long") => true
      case ("float", "double") => true
      case ("integer", "double") => true
      case ("long", "double") => true
      case _ =>
        (from, to) match {
          case (f: org.apache.spark.sql.types.DecimalType,
              t: org.apache.spark.sql.types.DecimalType) =>
            t.scale == f.scale && t.precision >= f.precision
          case _ => false
        }
    }

  private def fields(st: StructType, prefix: String)
      : Seq[(String, DataType, Boolean)] =
    st.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => fields(s, path)
        case other => Seq((path, other, f.nullable))
      }
    }

  /** Element-wise type equality that recurses containers but treats
    * leaves atomically (so retyping is reported at the leaf path).
    */
  private def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: ArrayType, y: ArrayType) =>
      sameShape(x.elementType, y.elementType)
    case (x: MapType, y: MapType) =>
      sameShape(x.keyType, y.keyType) && sameShape(x.valueType, y.valueType)
    case (x, y) => x == y
  }

  /** Diff `from` → `to`. */
  def diff(from: StructType, to: StructType): Seq[Change] = {
    val f = fields(from, "").map(x => x._1 -> x).toMap
    val t = fields(to, "").map(x => x._1 -> x).toMap
    val added = (t.keySet -- f.keySet).toSeq.sorted.map { p =>
      val (_, dt, nullable) = t(p)
      Change("added", p, s"${dt.simpleString}" +
        (if (nullable) " (nullable)" else " (required)"),
        breaking = !nullable)
    }
    val dropped = (f.keySet -- t.keySet).toSeq.sorted.map { p =>
      Change("dropped", p, f(p)._2.simpleString, breaking = true)
    }
    val common = (f.keySet intersect t.keySet).toSeq.sorted
    val retyped = common.flatMap { p =>
      val (_, fd, _) = f(p)
      val (_, td, _) = t(p)
      if (sameShape(fd, td)) None
      else Some(Change("retyped", p,
        s"${fd.simpleString} -> ${td.simpleString}",
        breaking = !safeWidening(fd, td)))
    }
    val nullability = common.flatMap { p =>
      (f(p)._3, t(p)._3) match {
        case (false, true) => Some(Change("nullable-loosened", p,
          "required -> nullable", breaking = true))
        case (true, false) => Some(Change("nullable-tightened", p,
          "nullable -> required", breaking = false))
        case _ => None
      }
    }
    added ++ dropped ++ retyped ++ nullability
  }

  /** Convenience: diff two parquet tables' footers (no data read). */
  def diffTables(spark: SparkSession, fromPath: String,
      toPath: String): Seq[Change] =
    diff(spark.read.parquet(fromPath).schema,
      spark.read.parquet(toPath).schema)

  /** True iff old readers keep working on the new snapshot. */
  def backwardCompatible(from: StructType, to: StructType): Boolean =
    diff(from, to).forall(!_.breaking)
}
