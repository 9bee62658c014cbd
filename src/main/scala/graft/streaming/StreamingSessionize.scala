package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-window aggregation on Spark's native `session_window` —
  * the Spark-first sessionizer. Works identically on batch and
  * streaming inputs; the batch gaps-and-islands formulation lives in
  * `graft.operators.Sessionize` (the two are spec-asserted to agree).
  *
  * Streaming callers must `withWatermark(eventTimeCol, delay)` before
  * calling: append-mode session aggregation only finalizes a session
  * once the watermark passes its end (last event + gap), which is what
  * bounds state at scale — open sessions are the only state kept, and
  * each closes `gap` after its key goes quiet. Merging of overlapping
  * windows happens inside the state store, so a key's out-of-order
  * events within the watermark delay still coalesce into one session.
  */
object StreamingSessionize {

  /** Per-(key, session) summary: key, session_start, session_end
    * (last event + gap), n_events. One shuffle on (key, window); at
    * scale the state store holds only open sessions per key.
    */
  def sessions(df: DataFrame, keyCol: String, eventTimeCol: String,
      gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
