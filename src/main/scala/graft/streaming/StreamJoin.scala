package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: attribute each purchase
  * event to the views by the same user within the preceding
  * `windowSpec` interval — the canonical streaming attribution shape.
  *
  * Both sides carry event-time watermarks, which is what BOUNDS the
  * join state at scale: Spark buffers only rows younger than
  * (watermark − interval) per side, so state is O(event rate × window),
  * not O(stream history). Without the time-range predicate + watermarks
  * a stream-stream join would buffer both streams forever.
  */
object StreamJoin {

  /** @param events   streaming events (event_id, ts, user_id, event_type)
    * @param interval join window, e.g. "1 hour": views at most this far
    *                 before the purchase qualify
    * @param lateness max event lateness tolerated on each side
    */
  def purchaseViewAttribution(events: DataFrame, interval: String = "1 hour",
      lateness: String = "2 hours"): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    val views = events
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("view_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    purchases.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $interval"),
      "inner")
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))
  }
}
