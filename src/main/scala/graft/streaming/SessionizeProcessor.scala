package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` with EVENT-TIME TIMERS: per-user gap sessionization
  * where the stream itself decides when a session is over — the state
  * machine the old APIs approximate with manual timeout bookkeeping.
  *
  * Per key, one open session lives in a `ValueState` (start, last, count,
  * all epoch millis). Arriving rows fold in event-time order: a gap larger
  * than `gapMs` closes the open session (emitted inline — a later event
  * for the same user proves no earlier event can extend it under the
  * watermark), anything else extends it. After each batch the key's single
  * timer is re-armed at `last + gapMs`; when the WATERMARK crosses it,
  * [[handleExpiredTimer]] emits the session and clears state — idle users
  * cost one small state entry until their timer fires, then nothing.
  * State is partitioned by the grouping key and O(1) per user: the
  * standard keyed-state scale shape. */
class SessionizeProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {

  @transient private var open: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[(Long, Long, Long)]("open",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val ordered = rows.map(_._2).toArray.sorted
    var out = List.empty[(Long, Long, Long, Long)]
    var st: Option[(Long, Long, Long)] =
      if (open.exists()) Some(open.get()) else None
    ordered.foreach { t =>
      st = st match {
        case None => Some((t, t, 1L))
        case Some((s0, last, n)) =>
          if (t - last > gapMs) { out ::= ((key, s0, last, n)); Some((t, t, 1L)) }
          else Some((s0, math.max(last, t), n + 1L))
      }
    }
    st.foreach { s =>
      open.update(s)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(s._2 + gapMs)
    }
    out.reverse.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    if (open.exists()) {
      val (s0, last, n) = open.get()
      open.clear()
      Iterator((key, s0, last, n))
    } else Iterator.empty
  }
}
