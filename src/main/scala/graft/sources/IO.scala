package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, shiftleft, shiftright}
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

  /** Bit-interleaved Z-value of two non-negative integer columns
    * (`bits` bits each). A pure codegen'd expression — no UDF. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Write `df` Z-ordered on two integer dimensions: rows are
    * range-partitioned and sorted by the interleaved Z-value, so each
    * output file (and each parquet row group inside it) covers a
    * compact 2-D tile of the (a, b) space instead of a stripe of one
    * dimension. Min/max footer stats then prune multi-dimensional box
    * predicates on EITHER dimension — the data-layout lever for scan
    * locality at 100 TB, where a single-column sort only prunes its
    * leading column (IOSpec counts the prunable row groups for a box
    * filter under both layouts).
    *
    * Both dimensions are MSB-aligned to `bits` wide before
    * interleaving (uniform shift — order-preserving): with unequal raw
    * widths the wider column's high bits would own every leading
    * Z-bit and the layout would degenerate to a single-column sort.
    * Alignment costs one max() pass over the two columns. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int = 16, bits: Int = 16): Unit = {
    val mx = df.agg(max(col(colA).cast("long")), max(col(colB).cast("long"))).head
    def width(m: Long) = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(m))
    def aligned(c: Column, m: Long): Column = {
      val s = bits - width(m)
      if (s >= 0) shiftleft(c, s) else shiftright(c, -s)
    }
    df.withColumn("__z",
        zValue2(aligned(col(colA).cast("long"), mx.getLong(0)),
                aligned(col(colB).cast("long"), mx.getLong(1)), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

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
