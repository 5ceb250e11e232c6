package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift detector. The round driver REGENERATES
  * /root/testdata between rounds and physical types have changed
  * before (events.ts flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and
  * silently errored 47 queries until the loader was made adaptive).
  * This spec pins, per table, the exact column names and the SET of
  * types the engine is known to handle — so the next regen that drifts
  * outside the envelope produces ONE failure that names the table and
  * column, instead of dozens of cryptic per-query analysis errors.
  *
  * If this fails after a regen: extend the adaptive handling (see
  * `Tables.normalizeTs` for the pattern), verify the affected queries,
  * then widen the envelope here. */
class SchemaDriftSpec extends SparkSpecBase {

  private val intLike: Set[DataType]  = Set(IntegerType, LongType)
  private val fpLike: Set[DataType]   = Set(DoubleType, FloatType)
  private val str: Set[DataType]      = Set(StringType)
  private val tsLike: Set[DataType]   = Set(TimestampType, TimestampNTZType, DateType, LongType)
  private val vecLike: Set[DataType]  = Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
    ArrayType(DoubleType, true), ArrayType(DoubleType, false))

  private val envelope: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region"   -> Seq("r_regionkey" -> intLike, "r_name" -> str),
    "nation"   -> Seq("n_nationkey" -> intLike, "n_name" -> str, "n_regionkey" -> intLike),
    "customer" -> Seq("c_custkey" -> intLike, "c_name" -> str, "c_nationkey" -> intLike,
      "c_acctbal" -> fpLike, "c_mktsegment" -> str),
    "supplier" -> Seq("s_suppkey" -> intLike, "s_name" -> str, "s_nationkey" -> intLike,
      "s_acctbal" -> fpLike),
    "part"     -> Seq("p_partkey" -> intLike, "p_name" -> str, "p_brand" -> str,
      "p_type" -> str, "p_size" -> intLike, "p_retailprice" -> fpLike),
    "orders"   -> Seq("o_orderkey" -> intLike, "o_custkey" -> intLike, "o_orderstatus" -> str,
      "o_totalprice" -> fpLike, "o_orderdate" -> tsLike, "o_orderpriority" -> str),
    "lineitem" -> Seq("l_orderkey" -> intLike, "l_partkey" -> intLike, "l_suppkey" -> intLike,
      "l_linenumber" -> intLike, "l_quantity" -> fpLike, "l_extendedprice" -> fpLike,
      "l_discount" -> fpLike, "l_tax" -> fpLike, "l_returnflag" -> str,
      "l_linestatus" -> str, "l_shipdate" -> tsLike),
    "events"   -> Seq("event_id" -> intLike, "ts" -> tsLike, "user_id" -> intLike,
      "event_type" -> str, "value" -> fpLike, "props" -> str),
    "documents" -> Seq("doc_id" -> intLike, "text" -> str, "lang" -> str,
      "source" -> str, "n_chars" -> intLike),
    "embeddings" -> Seq("vec_id" -> intLike, "embedding" -> vecLike, "label" -> intLike)
  )

  test("every testdata table is inside the engine's schema envelope") {
    // the events read needs the legacy conf in case the NANOS layout
    // returns; scoped so the shared test session is not polluted
    val drifts = Confs.withSessionConf(spark,
        "spark.sql.legacy.parquet.nanosAsLong", "true") {
      envelope.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      val nameDrift =
        if (schema.fieldNames.toSeq != cols.map(_._1))
          Seq(s"$table: columns ${schema.fieldNames.mkString(",")} != expected ${cols.map(_._1).mkString(",")}")
        else Seq.empty
      val typeDrifts = cols.flatMap { case (name, allowed) =>
        schema.fields.find(_.name == name) match {
          case Some(f) if !allowed.contains(f.dataType) =>
            Some(s"$table.$name: ${f.dataType.catalogString} is outside the handled envelope " +
              s"{${allowed.map(_.catalogString).mkString(", ")}}")
          case None => Some(s"$table.$name: column missing")
          case _    => None
        }
      }
        nameDrift ++ typeDrifts
      }
    }
    assert(drifts.isEmpty,
      "TESTDATA REGEN DRIFT — extend the adaptive loaders (Tables.normalizeTs pattern), " +
        "re-verify, then widen this envelope:\n" + drifts.mkString("\n"))
  }
}
