package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Streaming changelog derivation: per entity key, emit a row only when
  * the tracked feature values actually CHANGE — the streaming face of
  * the batch [[graft.operators.History.scd2]] run-collapse, and the
  * store-write suppressor in front of an online materialization (a
  * snapshot stream that re-delivers every key each scan only costs
  * store I/O for keys whose values moved).
  *
  * This is the one operator in the streaming family whose semantics the
  * built-in stateful operators cannot express: `dropDuplicates` keys on
  * the full value (a key flapping A→B→A would dedup the second A away),
  * windowed aggs have no "previous emitted value" notion, and
  * stream-stream joins carry no per-key running state. It rides
  * `flatMapGroupsWithState` with per-key state = (frontier order key,
  * last emitted values), evicted by EVENT-TIME TIMEOUT `stateTtl` past
  * the key's last activity — so state is bounded by the live-key count,
  * not the stream's history, the same contract the reference's online
  * TTL expiry applies to the store itself.
  *
  * Contract (what the per-key state machine guarantees):
  *  - rows are processed in `(tsCol, orderCols)` order WITHIN each
  *    micro-batch (the group's batch slice is sorted here — bounded by
  *    the key's per-batch row count, never the corpus);
  *  - a row at-or-before the key's frontier is dropped (stale replay /
  *    at-least-once redelivery — idempotent by construction);
  *  - a row past the frontier advances it; it is EMITTED iff its
  *    values differ (null-safe structural equality) from the last
  *    emitted values;
  *  - the FIRST row of a key (or of a key whose state was
  *    ttl-evicted) always emits — after eviction a key re-baselines,
  *    exactly like a reference online store read after TTL expiry;
  *  - cross-batch out-of-order rows (older than a previous batch's
  *    frontier) are dropped, not retro-inserted — the standard
  *    changelog-derivation contract; size `watermarkDelay` to the
  *    feed's disorder and batches arrive time-ordered.
  *
  * 100 TB shape: one hash exchange on the entity key (the same shuffle
  * any latest-per-key reduction pays), per-key state O(1) — order key +
  * one value row — in the state store, per-batch sort bounded by the
  * key's slice. No window over history, no driver state.
  */
object Changelog {

  /** @param stream    streaming DataFrame (must include every named column)
    * @param tsCol     event-time column (TimestampType; watermarked here)
    * @param keyCols   entity key columns (the state grain)
    * @param orderCols extra tie-break columns after `tsCol` (must make
    *                  `(tsCol, orderCols)` a total order per key for a
    *                  deterministic changelog)
    * @param valueCols tracked feature columns (change = emit)
    * @param watermarkDelay max expected disorder, e.g. "1 hour"
    * @param stateTtl  event-time idle TTL past which a key's state is
    *                  evicted (bounds state at scale; an evicted key
    *                  re-baselines on next activity)
    * @return streaming DataFrame of the transition rows, schema =
    *         (keyCols ++ tsCol ++ orderCols ++ valueCols).distinct
    */
  def derive(
      stream: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCols: Seq[String],
      watermarkDelay: String,
      stateTtl: java.time.Duration): DataFrame = {
    require(keyCols.nonEmpty, "changelog needs at least one key column")
    require(valueCols.nonEmpty, "changelog needs at least one value column")
    require(!stateTtl.isNegative && !stateTtl.isZero,
      s"stateTtl must be positive, got $stateTtl")

    val projCols = (keyCols ++ Seq(tsCol) ++ orderCols ++ valueCols).distinct
    // Spark's watermark does NOT filter null event times out of
    // flatMapGroupsWithState input; one null-ts row would NPE the group
    // function (getAs[Timestamp].getTime) and kill the query. A row
    // with no event time has no place on the changelog — drop it here.
    val projected = stream
      .filter(col(tsCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .select(projCols.map(col): _*)
    val schema = projected.schema
    require(schema(tsCol).dataType == TimestampType,
      s"event-time column '$tsCol' must be TimestampType, got ${schema(tsCol).dataType}")

    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val tsIdx = schema.fieldIndex(tsCol)
    val ordIdx = (tsCol +: orderCols.filterNot(_ == tsCol)).map(schema.fieldIndex).toArray
    val valIdx = valueCols.map(schema.fieldIndex).toArray

    // order columns are compared with the per-field Comparable order
    // inside the GROUP FUNCTION — validate comparability HERE, at plan
    // time, not on the first matching row of a long-running query
    // (an array/struct/binary tie-break would otherwise start the
    // query, create state + checkpoint, and THEN die mid-batch with
    // the cmpAny IllegalArgumentException — review r13). Binary is
    // excluded too: it surfaces as Array[Byte], which is not
    // Comparable.
    ordIdx.foreach { i =>
      val f = schema(i)
      import org.apache.spark.sql.types._
      val ok = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | _: DecimalType | _: StringType |
             TimestampType | TimestampNTZType | DateType | BooleanType => true
        // DayTimeIntervalType surfaces as java.time.Duration, which IS
        // Comparable — it worked through cmpAny before the r13 plan-time
        // whitelist and stays admitted (ADVICE r13). YearMonthInterval
        // stays OUT deliberately: its runtime java.time.Period does not
        // implement Comparable (months vs days is ambiguous), so it
        // would die in the group function's compare.
        case _: DayTimeIntervalType => true
        case _ => false
      }
      require(ok, s"changelog order column '${f.name}' of type " +
        s"${f.dataType} has no total order the state compare supports — " +
        "use an atomic (non-binary, non-year-month-interval) type")
    }

    // state row layout: order-key fields then value fields (dedup'd —
    // a column may serve as both)
    val stateIdx: Array[Int] = (ordIdx ++ valIdx).distinct
    val ordInState: Array[Int] = ordIdx.map(i => stateIdx.indexOf(i))
    val valInState: Array[Int] = valIdx.map(i => stateIdx.indexOf(i))
    val stateSchema = StructType(stateIdx.map(schema(_)).toIndexedSeq)

    val ttlMs = stateTtl.toMillis

    val keyEnc = Encoders.row(StructType(keyIdx.map(schema(_)).toIndexedSeq))
    val rowEnc = Encoders.row(schema)
    val stateEnc = Encoders.row(stateSchema)

    // natural Comparable order per field, nulls first — the same total
    // order a SQL ORDER BY (ASC NULLS FIRST) gives the oracle
    def cmpAny(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
      case (x, _) => throw new IllegalArgumentException(
        s"order column value of ${x.getClass} is not Comparable")
    }
    def cmpOrd(a: Row, aIdx: Array[Int], b: Row, bIdx: Array[Int]): Int = {
      var i = 0
      while (i < aIdx.length) {
        val c = cmpAny(a.get(aIdx(i)), b.get(bIdx(i)))
        if (c != 0) return c
        i += 1
      }
      0
    }
    // deep equality: BinaryType values (GraftType.Bytes features)
    // surface as Array[Byte], where Objects.equals is REFERENCE
    // equality — every re-delivered unchanged bytes value would read
    // as "changed" and the changelog would emit the full feed every
    // batch, defeating the operator's change-suppression contract.
    // Array-typed feature values generally (ArrayType columns surface
    // as Seq, but nested binary elements are arrays again) compare
    // element-wise via deepEq.
    def deepEq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: Array[_], y: Array[_]) =>
        x.length == y.length && x.indices.forall(i => deepEq(x(i), y(i)))
      case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
        x.length == y.length && x.indices.forall(i => deepEq(x(i), y(i)))
      // MapType values and struct Rows recurse too: Map.equals compares
      // VALUES with ==, which is reference equality for nested byte
      // arrays — a map<string,binary> feature would read as "changed"
      // on every re-delivery, defeating the suppression contract
      // (review r13). Binary map KEYS stay unsupported (no equality to
      // look them up by) — vanishingly rare, and they fail closed: the
      // value reads as changed, never as falsely-equal.
      case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
        x.size == y.size && x.asInstanceOf[scala.collection.Map[Any, Any]]
          .forall { case (k, v) =>
            y.asInstanceOf[scala.collection.Map[Any, Any]].get(k) match {
              case Some(v2) => deepEq(v, v2)
              case None => false
            }
          }
      case (x: Row, y: Row) =>
        x.length == y.length && (0 until x.length).forall(i => deepEq(x.get(i), y.get(i)))
      case _ => java.util.Objects.equals(a, b)
    }
    def valuesEqual(row: Row, st: Row): Boolean = {
      var i = 0
      while (i < valIdx.length) {
        if (!deepEq(row.get(valIdx(i)), st.get(valInState(i))))
          return false
        i += 1
      }
      true
    }
    def toState(row: Row, emittedVals: Row): Row =
      // frontier order key from the newest processed row; values from
      // the last EMITTED row (emittedVals is in state layout already)
      Row.fromSeq(stateIdx.indices.map { si =>
        val asOrd = ordInState.indexOf(si)
        if (asOrd >= 0) row.get(ordIdx(asOrd)) else emittedVals.get(si)
      })

    val fn = (key: Row, rows: Iterator[Row], state: GroupState[Row]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty[Row]
      } else {
        val sorted = rows.toArray
        java.util.Arrays.sort(sorted, new java.util.Comparator[Row] {
          def compare(a: Row, b: Row): Int = cmpOrd(a, ordIdx, b, ordIdx)
        })
        var st: Row = state.getOption.orNull
        val out = Array.newBuilder[Row]
        var lastTsMs = Long.MinValue
        var i = 0
        while (i < sorted.length) {
          val row = sorted(i)
          val fresh = st == null || cmpOrd(row, ordIdx, st, ordInState) > 0
          if (fresh) {
            val changed = st == null || !valuesEqual(row, st)
            if (changed) {
              out += row
              st = Row.fromSeq(stateIdx.map(row.get).toIndexedSeq)
            } else {
              st = toState(row, st) // advance the frontier, keep values
            }
            lastTsMs = row.getAs[java.sql.Timestamp](tsIdx).getTime
          }
          i += 1
        }
        if (st != null) {
          state.update(st)
          // event-time timeout: fire when the watermark passes the
          // key's last activity + ttl (must stay above the current
          // watermark or Spark rejects it)
          val wm = state.getCurrentWatermarkMs()
          val base = if (lastTsMs == Long.MinValue)
            st.getAs[java.sql.Timestamp](ordInState(0)).getTime
          else lastTsMs
          state.setTimeoutTimestamp(math.max(base + ttlMs, wm + 1))
        }
        out.result().iterator
      }
    }

    projected
      .groupByKey(r => Row.fromSeq(keyIdx.map(r.get).toIndexedSeq))(keyEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fn)(stateEnc, rowEnc)
  }
}
