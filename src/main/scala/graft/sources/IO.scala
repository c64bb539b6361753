package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks beyond the catalog: parquet, CSV, JSON(L), with
  * the options a pipeline needs set explicitly (schemas always
  * declared on read — schema inference is a full extra pass over the
  * data and is never acceptable at 100 TB).
  *
  * Partitioned writes (`writeParquetPartitioned`) lay data out for
  * partition pruning: a filter on the partition column prunes whole
  * directories before any file is opened.
  */
object IO {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout: `path/col=value/...`. */
  def writeParquetPartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  // second-only formats would silently truncate the microsecond
  // precision the event tables carry; the optional [.SSSSSS] section
  // also accepts external CSVs without a fractional part
  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .schema(schema)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  // ORC: the other columnar format warehouses exchange — same pruning
  // and predicate-pushdown properties as parquet through Catalyst
  def readOrc(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
