package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Row, SaveMode}

/** One idempotent batch write to an external store.
  *
  * The contract [[BufferedStreamSink]] builds its retry loop on:
  * `write(batch, id)` must be REPLAYABLE — running it twice for the
  * same `batchId` (a retried failure, a restarted stream re-emitting
  * the last uncommitted micro-batch) leaves the store with exactly one
  * copy of the batch. How that is achieved is the implementation's
  * business: path-per-batch overwrite for files, delete-then-insert
  * keyed on the batch id for SQL stores.
  */
trait BatchWriter extends Serializable {
  def write(batch: Dataset[Row], batchId: Long): Unit
}

/** File-store implementation: each batch lands as a `batch=<id>`
  * parquet directory; replay overwrites the same directory. */
class ParquetBatchWriter(path: String) extends BatchWriter {
  override def write(batch: Dataset[Row], batchId: Long): Unit =
    batch.write.mode(SaveMode.Overwrite).parquet(s"$path/batch=$batchId")
}

/** Executes one SQL statement against the external store. The
  * indirection keeps [[JdbcBatchWriter]] testable in a no-network
  * sandbox (the spec records statements) and swappable against any
  * driver in production; implementations must be serializable because
  * INSERTs run on executors. */
trait SqlExecutor extends Serializable {
  def execute(sql: String): Unit
}

/** JDBC-shaped batch INSERT writer — the reference's insert loop
  * (solarman.py:192-225 batch-inserts the polled rows through its
  * client into a Buffer table, tables.sql:34-61) re-expressed for a
  * distributed writer:
  *
  *  - rows are formatted into bounded multi-row `INSERT INTO t (...)
  *    VALUES (...), ...` statements PER INPUT PARTITION
  *    (`foreachPartition`): every executor streams its own partitions
  *    to the store, the driver never materializes the data — the only
  *    shape that survives a 100 TB backfill;
  *  - `insertBatchSize` bounds statement size (the reference's
  *    bounded-queue batching);
  *  - every row carries the micro-batch id (`_batch_id`) and its
  *    task's partition id (`_part_id`). Idempotence holds at BOTH
  *    replay granularities: each TASK first deletes its own
  *    (batch, partition) slice — so a Spark task retry / speculative
  *    re-run replaces its previous partial attempt instead of
  *    duplicating it — and `write` first deletes the whole batch id,
  *    covering a full micro-batch replay whose partitioning changed
  *    (e.g. AQE picked a different layout on the retried attempt).
  *
  * Retry/backpressure live one level up in [[BufferedStreamSink]];
  * this class only knows how to land one batch idempotently.
  */
class JdbcBatchWriter(table: String, exec: SqlExecutor, insertBatchSize: Int = 1000)
  extends BatchWriter {

  override def write(batch: Dataset[Row], batchId: Long): Unit = {
    val cols = batch.columns
    val colList = (cols ++ Seq("_part_id", "_batch_id")).mkString(", ")
    exec.execute(s"DELETE FROM $table WHERE _batch_id = $batchId")
    val e = exec // avoid closing over `this`
    val bs = insertBatchSize
    val t = table
    batch.foreachPartition { (rows: Iterator[Row]) =>
      val partId = org.apache.spark.TaskContext.getPartitionId()
      // task-granular replay: a re-run task (failure, speculation)
      // replaces exactly its own slice
      e.execute(s"DELETE FROM $t WHERE _batch_id = $batchId AND _part_id = $partId")
      rows.grouped(bs).foreach { chunk =>
        val values = chunk.map { r =>
          (r.toSeq.map(JdbcBatchWriter.sqlLiteral) ++
            Seq(partId.toString, batchId.toString))
            .mkString("(", ", ", ")")
        }.mkString(", ")
        e.execute(s"INSERT INTO $t ($colList) VALUES $values")
      }
    }
  }
}

object JdbcBatchWriter {
  /** Plain-SQL literal for a row value: quoted strings with both
    * quote AND backslash escaping (backslash-escaping stores — the
    * reference's ClickHouse, MySQL — would otherwise let a trailing
    * backslash eat the closing quote: literal breakout), ISO
    * timestamps/dates, NULL for null, plain rendering for
    * numerics/booleans. Non-finite doubles and non-scalar values are
    * rejected loudly — silently emitting `NaN` or `[D@1a2b3c` would
    * corrupt the store. */
  private val UtcTs = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  def sqlLiteral(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    // explicit UTC render: Timestamp.toString formats in the executor
    // JVM's default timezone, which would make the stored literal
    // depend on where the task ran
    case t: Timestamp => "'" + UtcTs.format(t.toInstant) + "'"
    case d: java.sql.Date => "'" + d.toString + "'"
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, s"non-finite double not SQL-expressible: $d")
      d.toString
    case f: Float =>
      require(!f.isNaN && !f.isInfinite, s"non-finite float not SQL-expressible: $f")
      f.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Boolean | _: java.math.BigDecimal |
              _: scala.math.BigDecimal) => n.toString
    case other =>
      throw new IllegalArgumentException(
        s"JdbcBatchWriter: unsupported literal type ${other.getClass.getName} " +
          "(flatten arrays/structs before the sink)")
  }
}
