package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic columnar IO: the engine's source/sink surface beyond the
  * driver's parquet test tables. Parquet is the canonical format
  * (splittable, predicate pushdown, column pruning); ORC is the
  * equivalent columnar alternative (same pushdown/pruning path);
  * CSV/JSON are interchange formats (schema-on-read, no pushdown — a
  * 100 TB pipeline lands them into parquet first, which is exactly
  * what `convert` does).
  */
object IO {

  val formats: Set[String] = Set("parquet", "orc", "csv", "json")

  /** Read `path` in `format`. CSV/JSON take an explicit schema (never
    * infer at scale — inference is a full extra pass over the data). */
  def read(spark: SparkSession, path: String, format: String = "parquet",
           schema: Option[StructType] = None): DataFrame = {
    require(formats(format), s"unsupported format: $format")
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    val withOpts = format match {
      case "csv" => withSchema.option("header", "true")
      case _ => withSchema
    }
    withOpts.load(path)
  }

  /** Write `df` to `path`. `partitionBy` produces hive-style directory
    * partitioning — the scale lever for downstream partition pruning
    * (readers of one key touch one directory, not the dataset). */
  def write(df: DataFrame, path: String, format: String = "parquet",
            partitionBy: Seq[String] = Nil,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(formats(format), s"unsupported format: $format")
    val w = df.write.format(format).mode(mode)
    val withOpts = format match {
      case "csv" => w.option("header", "true")
      case _ => w
    }
    (if (partitionBy.nonEmpty) withOpts.partitionBy(partitionBy: _*) else withOpts)
      .save(path)
  }

  /** Land an interchange-format dataset as (optionally partitioned)
    * parquet — the first step of any pipeline over raw drops. */
  def convert(spark: SparkSession, inPath: String, inFormat: String,
              schema: StructType, outPath: String,
              partitionBy: Seq[String] = Nil): Unit =
    write(read(spark, inPath, inFormat, Some(schema)), outPath,
          partitionBy = partitionBy)

  /** Persist `df` as a bucketed (and optionally bucket-sorted) managed
    * table. Bucketing is THE shuffle eliminator for repeated fact-fact
    * joins at 100 TB: two tables bucketed on the join key into the same
    * bucket count join with zero exchanges — the shuffle was paid once
    * at write time and amortizes over every subsequent join/aggregation
    * on that key (IOSpec pins the no-exchange plan). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}

/** Temp-view catalog over a test-data directory: registers every table
  * so the full corpus is queryable via `spark.sql`. */
object GraftCatalog {
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
