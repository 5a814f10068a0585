package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetWriteSupport}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-side parquet write of a SMALL driver-held row set — the
  * micro-batch ingest's segment frames are a few hundred rows the
  * driver is already holding, and routing them through
  * `df.write.parquet` costs a full Spark write job each (task launch,
  * FileFormatWriter setup, output-committer temp-dir dance, job
  * commit) — measured ~85–100 ms per tree per batch, a pure fixed
  * cost at trigger frequency. This writes ONE parquet part file with
  * Spark's own [[ParquetWriteSupport]] (the exact row/schema encoding
  * `df.write` produces, so every reader — plain scans, the versioned
  * index-frame cache, compaction — sees an indistinguishable file),
  * no job, no committer.
  *
  * Second `private[sql]` seam in this bridge (the [[SessionBridge]]
  * pattern): compiled against the public Spark OSS jars. Bounded use
  * only — callers hold the rows; this is NOT a general write path.
  */
object DriverParquet {

  private class RowsBuilder(path: Path, ws: WriteSupport[InternalRow])
      extends ParquetWriter.Builder[InternalRow, RowsBuilder](path) {
    override def self(): RowsBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] = ws
  }

  /** Write `rows` as `dir/part-00000-<uuid><codec-ext>.parquet`
    * under the session's parquet compression codec. The dir
    * is created; existing contents are left alone (ingest staging
    * dirs are pre-cleared by their owners).
    */
  def write(
      spark: SparkSession,
      rows: Seq[Row],
      schema: StructType,
      dir: String): Unit = {
    // session-merged hadoop conf (explicitly-set spark.sql.* keys ride
    // along), then the keys ParquetWriteSupport.init /
    // SparkToParquetSchemaConverter assert — the same values
    // ParquetFileFormat.prepareWrite propagates for df.write
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    val sqlc = spark.sessionState.conf
    conf.set(
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlc.legacyParquetNanosAsLong.toString)
    conf.set(
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlc.parquetInferTimestampNTZEnabled.toString)
    conf.set(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlc.writeLegacyParquetFormat.toString)
    conf.set(
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlc.parquetOutputTimestampType.toString)
    conf.set(
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlc.parquetFieldIdWriteEnabled.toString)
    conf.set(
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    // honor the session's codec (spark.sql.parquet.compression.codec)
    // through the same alias mapping df.write uses — a session that
    // overrides the codec must get indistinguishable files here too
    val codec = CompressionCodecName.fromConf(
      ParquetOptions.getParquetCompressionCodecName(
        sqlc.parquetCompressionCodec.toLowerCase(java.util.Locale.ROOT)))
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val file = new Path(
      d,
      s"part-00000-${java.util.UUID.randomUUID()}" +
        s"${codec.getExtension}.parquet")
    val writer = new RowsBuilder(file, new ParquetWriteSupport)
      .withConf(conf)
      .withCompressionCodec(codec)
      .build()
    try {
      val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      rows.foreach(r => writer.write(toCatalyst(r).asInstanceOf[InternalRow]))
    } finally writer.close()
  }
}
