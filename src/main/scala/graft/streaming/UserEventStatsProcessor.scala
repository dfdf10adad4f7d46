package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` processor (the Spark 4.x arbitrary-state API): live
  * per-user event statistics held in MULTIPLE typed state variables — a
  * `ValueState` running total, a `MapState` per-event-type breakdown, and a
  * `ValueState` emission version. Composite state like this is exactly what
  * the older `mapGroupsWithState` single-state-object API could not express
  * without packing everything into one struct (and rewriting all of it on
  * every update — a real cost once per-key state is large: with RocksDB
  * state backing, a `MapState` update touches one key, not the whole map).
  *
  * Emits `(userId, version, nEvents, nClicks, nPurchases)` once per key per
  * micro-batch; the latest version per key is the live view. State grows
  * O(#distinct event types) per user and is partitioned by the stream's
  * grouping key — the standard scale shape for keyed streaming state. */
class UserEventStatsProcessor
    extends StatefulProcessor[Long, (Long, String), (Long, Long, Long, Long, Long)] {

  @transient private var total: ValueState[Long] = _
  @transient private var byType: MapState[String, Long] = _
  @transient private var version: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
    byType = getHandle.getMapState[String, Long]("byType",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    version = getHandle.getValueState[Long]("version", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    var n = if (total.exists()) total.get() else 0L
    rows.foreach { case (_, eventType) =>
      n += 1
      val cur = if (byType.containsKey(eventType)) byType.getValue(eventType) else 0L
      byType.updateValue(eventType, cur + 1L)
    }
    total.update(n)
    val v = (if (version.exists()) version.get() else 0L) + 1L
    version.update(v)
    def count(eventType: String): Long =
      if (byType.containsKey(eventType)) byType.getValue(eventType) else 0L
    Iterator((key, v, n, count("click"), count("purchase")))
  }
}
