package graft.sinks

import org.apache.spark.sql.types._

/** ClickHouse DDL generation from Spark schemas — the engine-side analog
  * of the reference's migrations (migrations/clickhouse/000001..000004):
  * ReplacingMergeTree(version) tables partitioned by month with the DDL
  * sort keys, plus `FINAL` views. A user switching from the reference can
  * bootstrap an identical ClickHouse layout from the pipeline's own
  * output schemas.
  */
object ClickHouseDDL {

  /** Spark type → ClickHouse type (SURVEY.md §1.2 mapping, inverted). */
  def chType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case StringType => "String"
      case ArrayType(StringType, _) => "Array(String)"
      case TimestampType | TimestampNTZType => "DateTime64(3, 'UTC')"
      case DateType => "Date"
      case BooleanType => "UInt8"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case ShortType => "Int16"
      case other => throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
    }
    // Arrays can't be Nullable in CH; dates use DEFAULT 0 semantics (P11)
    dt match {
      case _: ArrayType => base
      case DateType | TimestampType | TimestampNTZType if nullable => base // DEFAULT 0 on insert-omit
      case _ if nullable => s"Nullable($base)"
      case _ => base
    }
  }

  def createTable(schema: StructType, database: String, table: String,
                  orderBy: Seq[String], partitionBy: String = "toYYYYMM(version)"): String = {
    val cols = schema.fields.map { f =>
      val nullable = f.nullable && !orderBy.contains(f.name) && f.name != "version"
      // nullable dates/timestamps follow the reference DDL exactly
      // (`Date DEFAULT 0`, migrations 000001:22-29): the sink omits null
      // fields from JSONEachRow (P11) so the DEFAULT applies; the explicit
      // clause also protects strict servers (input_format_null_as_default=0)
      val default = f.dataType match {
        case DateType | TimestampType | TimestampNTZType if nullable => " DEFAULT 0"
        case _ => ""
      }
      s"  `${f.name}` ${chType(f.dataType, nullable)}$default"
    }.mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $database.$table (
       |$cols
       |) ENGINE = ReplacingMergeTree(version)
       |PARTITION BY $partitionBy
       |ORDER BY (${orderBy.mkString(", ")})""".stripMargin
  }

  def createFinalView(database: String, table: String): String =
    s"CREATE VIEW IF NOT EXISTS $database.${table}_view AS SELECT * FROM $database.$table FINAL"

  /** The full migration set for the three pipeline tables, derived from
    * actual transform output schemas + graft.pipeline.IssuePipeline.sortKeys.
    */
  def migrations(database: String, schemas: Map[String, StructType],
                 sortKeys: Map[String, Seq[String]]): Seq[String] =
    sortKeys.keys.toSeq.sorted.flatMap { t =>
      Seq(createTable(schemas(t), database, t, sortKeys(t)), createFinalView(database, t))
    }
}
