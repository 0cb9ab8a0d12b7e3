package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One field of a per-tenant mapping schema: a source expression, a
  * destination (canonical) name, an optional target type and an optional
  * default applied when the source evaluates to null.
  *
  * Mirrors the reference's dynamic mapping config resolved per
  * (workflow_system_name, company_id) at
  * /root/reference/sqs_sensor_dag.py:100-103 and threaded into the
  * transform steps at /root/reference/parallelized_data_pipeline_dag.py:222,247
  * [inferred]. There the mapping drives row-at-a-time Python dict
  * rewrites; here it compiles ONCE (per tenant, at plan time) into a
  * `Seq[Column]` projection that whole-stage codegen fuses into the scan
  * — per-row cost is a generated-code projection, not an interpreted map.
  */
final case class FieldMapping(
    src: String,
    dst: String,
    castTo: Option[String] = None,
    default: Option[String] = None,
)

object MappingCompiler {

  /** Compile a mapping schema into a projection list. Pure plan-time
    * work; no UDFs, no driver-side data movement — safe at any scale.
    */
  def compile(mapping: Seq[FieldMapping]): Seq[Column] =
    mapping.map { m =>
      val base = expr(m.src)
      val defaulted = m.default.fold(base)(d => coalesce(base, expr(d)))
      m.castTo.fold(defaulted)(defaulted.cast).as(m.dst)
    }

  /** Apply a mapping schema to a frame (the TransformationStep). */
  def transform(df: DataFrame, mapping: Seq[FieldMapping]): DataFrame =
    df.select(compile(mapping): _*)

  /** Parse a mapping config document of the shape
    * `[{"src": ..., "dst": ..., "cast": ..., "default": ...}, ...]`
    * (the [inferred] payload of read_mapping_config,
    * /root/reference/sqs_sensor_dag.py:101-103). Uses json4s, which ships
    * with Spark — no extra dependency.
    */
  def fromJson(json: String): Seq[FieldMapping] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(json) match {
      case JArray(items) =>
        items.map { it =>
          FieldMapping(
            src = (it \ "src").extract[String],
            dst = (it \ "dst").extract[String],
            castTo = (it \ "cast").extractOpt[String],
            default = (it \ "default").extractOpt[String],
          )
        }
      case other => throw new IllegalArgumentException(s"mapping config must be a JSON array, got $other")
    }
  }
}
