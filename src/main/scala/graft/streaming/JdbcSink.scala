package graft.streaming

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** R9 option B: the reference ships micro-batches to ClickHouse through
  * omclickhouse's async HTTP insert queue — at-least-once delivery
  * (`/root/reference/nginx.conf:59-64`: queue.type linkedlist +
  * action.resumeRetryCount -1). The Spark analog is a `foreachBatch` JDBC
  * writer, upgraded to effectively-once: every row carries its micro-batch
  * id, and a replayed batch first DELETEs its own id, so the
  * delete+reinsert pair is idempotent under foreachBatch's at-least-once
  * contract (no distributed transaction needed — the id scopes the rewrite).
  *
  * Integration-tested against embedded Derby (on the Spark classpath); the
  * JDBC url + driver jar are the only ClickHouse-specific parts of a real
  * deployment (`jdbc:clickhouse://...` with the official driver behaves
  * identically: ClickHouse DELETE ... WHERE on a replay id is a lightweight
  * mutation on the tiny replayed range).
  */
object JdbcSink {

  val BatchIdCol = "_batch_id"

  /** Strict identifier shape (optionally schema-qualified) — the table name
    * is necessarily interpolated into the DELETE, so reject anything that
    * could smuggle SQL. Deliberately NOT quoted in the statement: Spark's
    * append created the table unquoted, and quoting would defeat the
    * engine's case folding (Derby folds up) and stop matching it.
    */
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?$".r

  /** Shared guard for every sink that interpolates a table name into SQL
    * text ([[ClickHouseSink]] reuses it). */
  def requireIdent(table: String): Unit =
    require(Ident.matches(table), s"illegal table identifier: $table")

  /** Idempotent per-batch write: DELETE the batch id, then append. */
  def writeBatch(batch: DataFrame, batchId: Long, url: String,
                 table: String): Unit = {
    requireIdent(table)
    val conn = DriverManager.getConnection(url)
    try {
      // Engines fold unquoted identifiers differently (Derby → upper,
      // ClickHouse/Postgres → as-is/lower). Probe every folding, so a miss
      // means the table genuinely doesn't exist yet (first batch) rather
      // than silently skipping the DELETE and duplicating a replayed batch.
      val meta = conn.getMetaData
      val exists = Seq(table, table.toUpperCase, table.toLowerCase).distinct
        .exists { n =>
          val rs = meta.getTables(null, null, n, null)
          try rs.next() finally rs.close()
        }
      if (exists) {
        val st = conn.prepareStatement(
          s"""DELETE FROM $table WHERE "$BatchIdCol" = ?""")
        st.setLong(1, batchId); st.executeUpdate(); st.close()
      }
    } finally conn.close()
    batch.withColumn(BatchIdCol, lit(batchId))
      .write.mode("append").jdbc(url, table, new java.util.Properties)
  }

  /** Streams `df` into a JDBC table with per-batch idempotence. */
  def start(df: DataFrame, url: String, table: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, id: Long) => writeBatch(b, id, url, table))
      .start()
}
