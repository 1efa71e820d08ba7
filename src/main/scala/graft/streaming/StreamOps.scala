package graft.streaming

import graft.operators.Tokenize
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event for the streaming operators (mirrors the harness `events` table). */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Closed user session emitted by [[StreamOps.sessionize]]. */
case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                   n_events: Long, sum_value: Double)

private case class SessionState(start_ms: Long, end_ms: Long,
                                n_events: Long, sum_value: Double)

/** Structured Streaming operators.
  *
  * The reference has no stream query model — its sockets are shuffle
  * transport with EOS markers (SURVEY.md §2 O13). These operators are the
  * unbounded-input counterparts of the batch catalog: the SAME logical
  * transformations (tokenize → count; window → agg) expressed over
  * `readStream` sources, which is the Spark-native way to get incremental
  * execution, watermarked state eviction, and exactly-once sinks.
  *
  * Scale notes: all operators are keyed so state is hash-partitioned across
  * executors; watermarks bound state size (no unbounded aggregation state);
  * sessionize uses flatMapGroupsWithState with event-time timeout so closed
  * sessions are emitted and evicted instead of accumulating.
  */
object StreamOps {

  /** Streaming flagship: the reference's word count over an unbounded line
    * stream. Complete-mode aggregation state is bounded by vocabulary size. */
  def streamingWordCount(lines: DataFrame, textCol: String = "value"): DataFrame =
    Tokenize.tokenize(lines.select(col(textCol)), textCol)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Tumbling event-time window counts per event type with a watermark:
    * late data beyond `watermarkDelay` is dropped, closed windows are
    * evicted from state (append-mode emittable). */
  def windowedCounts(events: Dataset[Event],
                     windowLen: String = "10 minutes",
                     watermarkDelay: String = "5 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming count-min sketch: the d×w cell table maintained
    * incrementally over an unbounded token stream. Because CMS merge is an
    * elementwise sum (commutative + associative), the streaming
    * aggregation state IS the sketch — groupBy (j, cell) with a running
    * count. State is bounded by d·w cells REGARDLESS of stream length (no
    * watermark needed; complete-mode emittable), and after any prefix the
    * cells are bit-identical to the batch sketch of the same prefix
    * (StreamOpsSpec proves it micro-batch by micro-batch). Same md5 hash
    * family as the batch q_sketch_cms. */
  def streamingCms(lines: DataFrame, textCol: String = "value",
                   depth: Int = 4, width: Int = 64): DataFrame =
    Tokenize.tokenize(lines.select(col(textCol)), textCol)
      .select(col("word"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("cell",
        expr(s"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', word)), 1, 8), 16, 10) AS BIGINT) % $width"))
      .groupBy("j", "cell").agg(count(lit(1)).as("cn"))

  /** Incremental HyperLogLog: state = the m-register table itself (merge
    * is per-bucket MAX — commutative, associative, idempotent), so state
    * size is CONSTANT no matter how many keys stream through, and the
    * registers after any prefix are bit-identical to the batch sketch of
    * that prefix (StreamOpsSpec proves it per micro-batch). The same
    * md5-derived (bucket, rho) rule as the batch operator
    * ([[graft.operators.Sketches.hllRho]]), so stream and batch sketches
    * can be MERGED with each other — e.g. a live sketch unioned onto
    * yesterday's batch registers (q_sketch_hll_union's max-merge). Sparse
    * form: buckets never hit are simply absent (batch twin: reg = 0). */
  def streamingHll(rows: DataFrame, keyCol: String = "value",
                   m: Int = 64): DataFrame =
    rows.select(
        expr(s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      .select((col("h") % m).as("bucket"),
        expr(s"CAST(CASE WHEN h div $m = 0 THEN 55 ELSE 55 - length(bin(h div $m)) END AS BIGINT)")
          .as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("reg"))

  /** Streaming exact deduplication on event_id with watermark-bounded
    * state (dropDuplicatesWithinWatermark): duplicates arriving within the
    * watermark delay are suppressed, and key state is evicted once the
    * watermark passes — the unbounded-input twin of q_dedup_exact. */
  def dedupStream(events: Dataset[Event],
                  watermarkDelay: String = "10 minutes"): Dataset[Event] =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup: suppress documents whose bag-of-words
    * fingerprint (md5 of the sorted distinct token set — the same identity
    * as batch q_fingerprint) was already seen within the watermark. This
    * catches re-posts and shuffled near-copies that an id-dedup misses,
    * with the same watermark-bounded state guarantee. Input: (doc_id, ts,
    * text) rows; output keeps the first arrival of each fingerprint. */
  def dedupByFingerprint(docs: DataFrame,
                         watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", Tokenize.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-static enrichment: per micro-batch broadcast hash join of the
    * unbounded stream against a static dimension (the dimension is read
    * fresh per batch — no stream state). Join columns are qualified via
    * their Datasets so a dimension that also has a `user_id` column (or
    * dimKey == "user_id") resolves unambiguously. */
  def enrich(events: Dataset[Event], dim: DataFrame, dimKey: String): DataFrame = {
    val e = events.toDF()
    e.join(broadcast(dim), e("user_id") === dim(dimKey), "left")
  }

  /** Shared body of the click→purchase stream-stream joins: watermarked
    * both sides, user equi-key, purchase within `windowMs` AFTER the
    * click (the event-time bound that lets Spark evict buffered state —
    * required for any unbounded-unbounded join). One implementation so
    * the inner and outer variants cannot drift. */
  private def clickPurchaseJoin(clicks: Dataset[Event], purchases: Dataset[Event],
                                windowMs: Long, watermarkDelay: String,
                                joinType: String): DataFrame = {
    val c = clicks.toDF().withWatermark("ts", watermarkDelay).alias("c")
    val p = purchases.toDF().withWatermark("ts", watermarkDelay).alias("p")
    c.join(p,
      col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") <= col("c.ts") + expr(s"INTERVAL $windowMs MILLISECONDS"),
      joinType)
      .select(col("c.event_id").as("click_id"), col("p.event_id").as("purchase_id"),
        col("c.user_id").as("user_id"), col("p.value").as("purchase_value"))
  }

  /** Stream-stream inner join: match each click to purchases by the same
    * user within `windowMs` AFTER the click. */
  def clickToPurchase(clicks: Dataset[Event], purchases: Dataset[Event],
                      windowMs: Long = 30 * 60000L,
                      watermarkDelay: String = "10 minutes"): DataFrame =
    clickPurchaseJoin(clicks, purchases, windowMs, watermarkDelay, "inner")

  /** Stream-stream LEFT OUTER join: like [[clickToPurchase]], but clicks
    * with no purchase in the window are still emitted (null purchase side)
    * once the watermark proves no match can arrive — the state-eviction
    * deadline doubles as the null-emission trigger, which is why outer
    * stream-stream joins REQUIRE both the watermark and the time-range
    * bound. */
  def clickToPurchaseOuter(clicks: Dataset[Event], purchases: Dataset[Event],
                           windowMs: Long = 30 * 60000L,
                           watermarkDelay: String = "10 minutes"): DataFrame =
    clickPurchaseJoin(clicks, purchases, windowMs, watermarkDelay, "left_outer")

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * after `gapMs` of event-time silence per user (state timeout), emitting
    * one [[Session]] row. Custom state logic the built-in windows can't
    * express — the Spark-native replacement for a hand-rolled reducer. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start_ms, s.end_ms, s.n_events, s.sum_value))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- events) {
              val t = e.ts.getTime
              cur match {
                // within the gap of the session INTERVAL (either side) —
                // min/max so a late in-order-violating event extends the
                // bounds instead of rewinding end_ms (which would fire the
                // timeout early and split the session)
                case Some(s) if t >= s.start_ms - gapMs && t <= s.end_ms + gapMs =>
                  cur = Some(SessionState(math.min(s.start_ms, t),
                    math.max(s.end_ms, t), s.n_events + 1, s.sum_value + e.value))
                case Some(s) if t > s.end_ms + gapMs =>
                  closed ::= Session(userId, s.start_ms, s.end_ms, s.n_events, s.sum_value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(_) =>
                  // Older than (start - gap): a straggler predating the
                  // open session — emitted as its own closed singleton.
                  // ACCEPTED DIVERGENCE from the batch twin (q_sessionize):
                  // two such stragglers that would form one session in
                  // batch each become a singleton here, because state
                  // tracks only the newest open session per user. Tracking
                  // a bounded list of open sessions would close the gap at
                  // the cost of unbounded-ish state per hot user; within
                  // the watermark the common late-event case (t inside
                  // [start-gap, end+gap]) is merged exactly, and events
                  // older than the watermark are dropped either way.
                  closed ::= Session(userId, t, t, 1, e.value)
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_ms + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Gap sessionization on the `transformWithState` API — the same
    * semantics as [[sessionize]] (the flatMapGroupsWithState spelling)
    * re-expressed with typed ValueState + explicit event-time TIMERS:
    * each batch re-arms one timer at session_end + gap, and
    * handleExpiredTimer emits + evicts when the watermark passes it.
    * StreamOpsSpec proves the two implementations emit identical
    * sessions on the same input — the migration equivalence a team
    * moving to the new API needs. */
  def sessionizeTws(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                    watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorTws(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Per-user per-event-type running counts on MapState — the third
    * state primitive of the transformWithState API (ValueState:
    * dedupCounts; timers: sessionizeTws; MapState: here). Every batch
    * emits the updated cumulative count for each (user, type) it
    * touched; state per user is one map entry per DISTINCT type, not
    * per event. */
  def typeCounts(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Recent-K event buffer per user on ListState — completing the
    * transformWithState primitive tour (ValueState / MapState / timers /
    * ListState): each batch appends the user's events, truncates the
    * buffer to the newest `k` by (ts, event_id), and emits the user's
    * CURRENT window as one row — the "last K actions" feature a ranker
    * reads. State per user is bounded at k rows by construction. */
  def recentEvents(events: Dataset[Event], k: Int = 3): Dataset[RecentWindow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RecentEventsProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Content dedup WITH duplicate accounting on the `transformWithState`
    * API (Spark 4's arbitrary-state successor to mapGroupsWithState —
    * typed per-key state handles over the RocksDB store): every
    * micro-batch emits the key's cumulative occurrence count, so the
    * first-seen row is the `n = 1` emission and later emissions report
    * how often content recurs (the re-crawl frequency signal a
    * drop-silently dedup discards). State is one Long per key. */
  def dedupCounts(keys: Dataset[String]): Dataset[KeyCount] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(identity)
      .transformWithState(new DedupCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}

/** Cumulative occurrence count for a content key after a micro-batch. */
case class KeyCount(key: String, n: Long)

/** Cumulative per-type event count for a user after a micro-batch. */
case class TypeCount(user_id: Long, event_type: String, n: Long)

/** A user's newest-K event ids (ascending by event time) after a batch. */
case class RecentWindow(user_id: Long, event_ids: Seq[Long])

/** ListState buffer truncated to the newest k events per user. */
class RecentEventsProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, RecentWindow] {
  import org.apache.spark.sql.streaming.{TimerValues, TimeMode, TTLConfig}

  @transient private var buf: org.apache.spark.sql.streaming.ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[(Long, Long)]("recent",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               tv: TimerValues): Iterator[RecentWindow] = {
    val prev = if (buf.exists()) buf.get().toSeq else Seq.empty
    val merged = (prev ++ rows.map(e => (e.ts.getTime, e.event_id)))
      .sortBy(identity).takeRight(k)
    buf.put(merged.toArray)
    Iterator.single(RecentWindow(key, merged.map(_._2)))
  }
}

/** MapState[type → count] per user; emits the updated count for each
  * type touched in the batch. */
class TypeCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, TypeCount] {
  import org.apache.spark.sql.streaming.{TimerValues, TimeMode, TTLConfig}

  @transient private var m: org.apache.spark.sql.streaming.MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    m = getHandle.getMapState[String, Long]("counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               tv: TimerValues): Iterator[TypeCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    for (e <- rows) {
      val prev = if (m.containsKey(e.event_type)) m.getValue(e.event_type) else 0L
      m.updateValue(e.event_type, prev + 1L)
      touched += e.event_type
    }
    touched.iterator.map(t => TypeCount(key, t, m.getValue(t)))
  }
}

/** Timer-driven session processor: ValueState holds the open session;
  * one event-time timer per key marks its expiry. Merge rules mirror
  * [[StreamOps.sessionize]] exactly (in-gap events extend EITHER bound;
  * out-of-gap events close the old session inline). */
class SessionProcessorTws(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Session] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TimeMode, TTLConfig}

  @transient private var st: org.apache.spark.sql.streaming.ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessionState]("sess",
      org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               tv: TimerValues): Iterator[Session] = {
    var cur = if (st.exists()) Some(st.get()) else None
    var closed = List.empty[Session]
    for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
      val t = e.ts.getTime
      cur match {
        case Some(s) if t >= s.start_ms - gapMs && t <= s.end_ms + gapMs =>
          cur = Some(SessionState(math.min(s.start_ms, t),
            math.max(s.end_ms, t), s.n_events + 1, s.sum_value + e.value))
        case Some(s) if t > s.end_ms + gapMs =>
          closed ::= Session(key, s.start_ms, s.end_ms, s.n_events, s.sum_value)
          cur = Some(SessionState(t, t, 1L, e.value))
        case Some(_) =>
          // straggler predating (start − gap): its own closed singleton,
          // the open session stays — mirrors sessionize's third branch
          closed ::= Session(key, t, t, 1L, e.value)
        case None =>
          cur = Some(SessionState(t, t, 1L, e.value))
      }
    }
    cur.foreach { s =>
      st.update(s)
      // exactly one live timer per key: re-arm at the new expiry
      getHandle.listTimers().foreach(ts =>
        getHandle.deleteTimer(ts.asInstanceOf[Long]))
      getHandle.registerTimer(s.end_ms + gapMs)
    }
    closed.reverseIterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[Session] =
    if (st.exists()) {
      val s = st.get()
      st.clear()
      Iterator.single(Session(key, s.start_ms, s.end_ms, s.n_events, s.sum_value))
    } else Iterator.empty
}

/** One ValueState[Long] per key; emits the updated cumulative count for
  * every key touched in the batch. */
class DedupCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, String, KeyCount] {
  @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    seen = getHandle.getValueState[Long]("seen",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[String],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[KeyCount] = {
    val prev = if (seen.exists()) seen.get() else 0L
    val n = prev + rows.size
    seen.update(n)
    Iterator.single(KeyCount(key, n))
  }
}
