package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.online.{InMemoryOnlineStore, ParquetOnlineStore}
import graft.operators.PointInTimeJoin
import graft.operators.PointInTimeJoin.ViewJoin
import graft.registry.{Inference, Registry}
import graft.store.FeatureStore

/** Spark-backed engine tests, including the port of the reference's
  * as-of oracle (test_historical_retrieval.py:130-136 find_asof_record):
  * the PIT join must agree with a per-row nested-loop scan on randomized
  * data with duplicate timestamps and created-ts dedup.
  */
class EngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(s)
    s
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  // randomized feature rows: (key, event_ts, created_ts, value)
  private def genData(seed: Long, nKeys: Int, nRows: Int): Seq[(Long, Timestamp, Timestamp, Double)] = {
    val rnd = new scala.util.Random(seed)
    val base = ts("2024-01-01 00:00:00").getTime
    (0 until nRows).map { i =>
      val key = rnd.nextInt(nKeys).toLong
      // coarse event times -> plenty of exact duplicates
      val et = new Timestamp(base + rnd.nextInt(200) * 3600_000L)
      val ct = new Timestamp(base + rnd.nextInt(200) * 3600_000L)
      (key, et, ct, rnd.nextInt(1000).toDouble)
    }
  }

  /** Reference oracle (nested loop): latest row with
    * et <= entity_ts && et >= entity_ts - ttl, ties by created desc then
    * max payload (the engine's documented deterministic tiebreak). */
  private def asOfOracle(
      rows: Seq[(Long, Timestamp, Timestamp, Double)],
      key: Long, entityTs: Timestamp, ttl: Duration): Option[Double] = {
    val lower = entityTs.getTime - ttl.toMillis
    val cands = rows.filter { case (k, et, _, _) =>
      k == key && et.getTime <= entityTs.getTime &&
        (ttl.isZero || et.getTime >= lower)
    }
    if (cands.isEmpty) None
    else Some(cands.maxBy { case (_, et, ct, v) => (et.getTime, ct.getTime, v) }._4)
  }

  test("PIT join with a DATE-typed ENTITY ts takes the declarative route without crashing") {
    import spark.implicits._
    // the prune-window bounds job read min/max with getTimestamp — a
    // DATE entity ts threw ClassCastException before the join was even
    // built, killing exactly the fallback route non-timestamp ts types
    // exist for; non-timestamp ts now skips the (optional) prune window
    // (review r12)
    val featDf = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 10.0),
      (1L, java.sql.Date.valueOf("2024-01-05"), 20.0),
      (2L, java.sql.Date.valueOf("2024-01-03"), 30.0)).toDF("k", "et", "v")
    val entityDf = Seq(
      (1L, java.sql.Date.valueOf("2024-01-04")),
      (2L, java.sql.Date.valueOf("2024-01-02"))).toDF("k", "event_timestamp")
    val view = FeatureView("fv", Seq("e"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(featDf, "et"))
    val got = PointInTimeJoin.join(entityDf,
        Seq(ViewJoin(view, Seq("k"), Seq("v"), featDf)))
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(10.0), s"as-of 2024-01-04 must pick the 01-01 row: $got")
    assert(got(2L).isEmpty, s"feature dated AFTER the entity date must not match: $got")
  }

  test("PIT join with zero views returns the input frame untouched") {
    import spark.implicits._
    // previously stamped row ids, possibly localCheckpointed the whole
    // frame, and ran the bounds job — two jobs for a no-op (review r12)
    val entityDf = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "event_timestamp")
    assert(PointInTimeJoin.join(entityDf, Nil) eq entityDf)
  }

  test("PIT join agrees with nested-loop as-of oracle on random data (dup ts, created dedup)") {
    import spark.implicits._
    val data = genData(seed = 42, nKeys = 20, nRows = 2000)
    val featDf = data.toDF("k", "et", "ct", "v")
    val entityRows = genData(seed = 7, nKeys = 20, nRows = 300)
      .map { case (k, et, _, _) => (k, et) }
    val entityDf = entityRows.toDF("k", "event_timestamp")

    for (ttl <- Seq(Duration.ofHours(48), Duration.ZERO)) {
      val view = FeatureView("fv", Seq("e"), Seq(Feature("v", GraftType.Dbl)),
        ttl, DataFrameSource(featDf, "et", createdTimestampColumn = Some("ct")))
      val got = PointInTimeJoin.join(entityDf, Seq(ViewJoin(view, Seq("k"), Seq("v"), featDf)))
        .select("k", "event_timestamp", "v")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      assert(got.length == entityRows.length, "left-outer must preserve entity rows")
      got.foreach { case ((k, et), v) =>
        assert(v == asOfOracle(data, k, et, ttl),
          s"mismatch for key=$k ts=$et ttl=$ttl")
      }
    }
  }

  test("sub-second TTL bounds the window at micro precision on BOTH PIT paths (review r6)") {
    import spark.implicits._
    val entityTs = ts("2024-01-01 00:00:10")
    // rows 1.2 s and 1.8 s before the entity ts: a 1.5 s TTL keeps the
    // first and drops the second; truncating the TTL to whole seconds
    // (the old declarative INTERVAL-SECOND rendering) would drop both
    val rows = Seq(
      (1L, new Timestamp(entityTs.getTime - 1200L), ts("2024-01-01 00:00:00"), 11.0),
      (2L, new Timestamp(entityTs.getTime - 1800L), ts("2024-01-01 00:00:00"), 22.0))
    val featDf = rows.toDF("k", "et", "ct", "v")
    val entityDf = Seq((1L, entityTs), (2L, entityTs)).toDF("k", "event_timestamp")
    val ttl = Duration.ofMillis(1500)

    // declarative path (no tie-break columns)
    val view = FeatureView("fv", Seq("e"), Seq(Feature("v", GraftType.Dbl)),
      ttl, DataFrameSource(featDf, "et", createdTimestampColumn = Some("ct")))
    val decl = PointInTimeJoin.join(entityDf, Seq(ViewJoin(view, Seq("k"), Seq("v"), featDf)))
      .select("k", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(decl(1L) === Some(11.0) && decl(2L) === None)

    // native sort-merge path
    val native = graft.plans.AsOfJoin.join(entityDf, featDf, Seq("k"),
        "event_timestamp", "et", ttl, orderCols = Seq("ct"), featureCols = Seq("v"))
      .select("k", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native === decl)
  }

  test("AsOfJoin rejects mismatched join-key types loudly (review r6)") {
    import spark.implicits._
    val ent = Seq((1, ts("2024-01-01 00:00:00"))).toDF("k", "event_timestamp")  // int key
    val feat = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "et", "v")  // bigint key
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin.join(ent, feat, Seq("k"), "event_timestamp", "et",
        Duration.ZERO, orderCols = Seq("et"), featureCols = Seq("v"))
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("inference: ts column, entity type, features") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "name", "score", "event_timestamp")
      .withColumn("__internal", lit(1))
    assert(Inference.inferEventTimestampColumn(df) == "event_timestamp")
    assert(Inference.inferEntityType(df, "user_id") == GraftType.Int64)
    assert(Inference.inferFeatures(df, Seq("user_id"), "event_timestamp", None)
      .map(_.name) == Seq("name", "score"))
    val two = df.withColumn("ts2", col("event_timestamp"))
    // explicit name wins even with two ts columns
    assert(Inference.inferEventTimestampColumn(two) == "event_timestamp")
    intercept[IllegalArgumentException](
      Inference.inferEventTimestampColumn(df.drop("event_timestamp")))
  }

  test("offline/online consistency (reference test_offline_online_store_consistency shape)") {
    import spark.implicits._
    // 5-row dataset incl. a null feature value and a duplicate-ts pair
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), Some(0.5)),
      (1L, ts("2024-01-02 10:00:00"), ts("2024-01-02 10:00:00"), Some(0.7)),
      (2L, ts("2024-01-02 09:00:00"), ts("2024-01-02 09:00:00"), None),
      (3L, ts("2024-01-01 08:00:00"), ts("2024-01-01 08:00:00"), Some(1.5)),
      (3L, ts("2024-01-01 08:00:00"), ts("2024-01-01 09:00:00"), Some(2.5))) // created-ts dedup
    val df = rows.map { case (k, et, ct, v) => (k, et, ct, v.map(Double.box).orNull) }
      .toDF("driver_id", "et", "ct", "conv_rate")
      .withColumn("conv_rate", col("conv_rate").cast("double"))

    val mini = new MiniRedis()
    // 7 stores: the 4 engine-native ones plus the three REFERENCE-layout
    // interop adapters (their unconditional-overwrite write semantics
    // still satisfy this suite — its windows never replay stale rows)
    for (store <- Seq(new InMemoryOnlineStore(),
        new ParquetOnlineStore(java.nio.file.Files.createTempDirectory("graftkv").toString),
        new graft.online.JdbcOnlineStore(graft.online.JdbcOnlineStore.derbyUrl(
          java.nio.file.Files.createTempDirectory("graftjdbc").toString + "/db")),
        new graft.online.RedisOnlineStore("127.0.0.1", mini.port),
        new graft.online.ReferenceRedisStore("127.0.0.1", mini.port),
        new graft.online.ReferenceSqlStore(graft.online.JdbcOnlineStore.derbyUrl(
          java.nio.file.Files.createTempDirectory("graftrefdb").toString + "/db")),
        new graft.online.ReferenceDocStore(graft.online.JdbcOnlineStore.derbyUrl(
          java.nio.file.Files.createTempDirectory("graftdocdb").toString + "/db")),
        // r14: the HRW-sharded composite (3 parquet children) must be
        // indistinguishable from a single store through the whole
        // materialize → serve → teardown lifecycle
        new graft.online.ShardedOnlineStore(IndexedSeq.fill(3)(
          new ParquetOnlineStore(
            java.nio.file.Files.createTempDirectory("graftshard").toString))),
        // r16: and so must a sharded_jdbc ring (VERDICT r15 #1)
        new graft.online.ShardedOnlineStore(IndexedSeq.fill(3)(
          new graft.online.JdbcOnlineStore(graft.online.JdbcOnlineStore.derbyUrl(
            java.nio.file.Files.createTempDirectory("graftshjdbc").toString + "/db")))))) {
      val fs = new FeatureStore("t", new Registry(), store, spark)
      fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
      fs.applyFeatureView(FeatureView("driver_stats", Seq("driver"),
        Seq(Feature("conv_rate", GraftType.Dbl)), Duration.ZERO,
        DataFrameSource(df, "et", Some("ct"))))
      fs.materialize(Seq("driver_stats"), ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))

      val resp = fs.getOnlineFeatures(Seq("driver_stats:conv_rate"),
        Seq(1L, 2L, 3L, 99L).map(id => Map[String, Any]("driver_id" -> id)))
      val vals = resp.toMap("driver_stats:conv_rate")
      val stats = resp.statuses("driver_stats:conv_rate")
      assert(vals(0) == 0.7)             // latest of driver 1
      assert(vals(1) == null)            // null feature materialized
      assert(stats(1) == "NOT_FOUND")    // null value -> NOT_FOUND status
      assert(vals(2) == 2.5)             // created-ts dedup picked later created
      assert(stats(3) == "NOT_FOUND")    // missing key
      assert(vals(3) == null)

      // offline agrees at the same timestamps
      val entity = Seq((1L, ts("2024-01-03 00:00:00")), (3L, ts("2024-01-03 00:00:00")))
        .toDF("driver_id", "event_timestamp")
      val hist = fs.getHistoricalFeatures(entity, Seq("driver_stats:conv_rate"))
        .orderBy("driver_id").collect()
      assert(hist(0).getAs[Double]("conv_rate") == 0.7)
      assert(hist(1).getAs[Double]("conv_rate") == 2.5)

      // incremental: next start = last end
      fs.materializeIncremental(Seq("driver_stats"), ts("2024-01-04 00:00:00"))
      val ivs = fs.registry.materializationIntervals("driver_stats")
      assert(ivs.size == 2 && ivs(1).start == ivs(0).end)

      // incremental start = MAX recorded end, not the last-APPENDED
      // interval's (review r12): a backfill of old history appended
      // after newer materializations must not drag the start back
      fs.registry.applyMaterialization("driver_stats",
        ts("2020-01-01 00:00:00"), ts("2020-02-01 00:00:00"))
      fs.materializeIncremental(Seq("driver_stats"), ts("2024-01-05 00:00:00"))
      val ivs2 = fs.registry.materializationIntervals("driver_stats")
      assert(ivs2.last.start == ts("2024-01-04 00:00:00"),
        s"start must be the max recorded end, got ${ivs2.last.start}")

      fs.teardown()
      assert(fs.registry.listFeatureViews.isEmpty)
    }
    assert(mini.keyCount == 0, "redis teardown must SCAN+DEL every store key")
    mini.stop()
  }

  test("RedisOnlineStore: LWW replay idempotence, CDC delete, stale write rejected") {
    import spark.implicits._
    val mini = new MiniRedis()
    val store = new graft.online.RedisOnlineStore("127.0.0.1", mini.port)
    val fs = new FeatureStore("r", new Registry(), store, spark)
    fs.applyEntity(Entity("user", GraftType.Int64, Some("user_id")))
    val view = FeatureView("uv", Seq("user"),
      Seq(Feature("v", GraftType.Dbl)), Duration.ZERO,
      DataFrameSource(Seq((1L, ts("2024-01-02 00:00:00"), 2.0))
        .toDF("user_id", "et", "v"), "et"))
    fs.applyFeatureView(view)
    val vv = fs.registry.getFeatureView("uv")

    def put(rows: Seq[(Long, String, Double)]): Unit =
      store.upsert("r", vv, Seq("user_id"),
        rows.map { case (k, t, v) => (k, ts(t), v) }.toDF("user_id", "et", "v"),
        "et", None)
    def get(ids: Seq[Long]): Seq[Any] =
      store.read("r", vv, Seq("user_id"),
        ids.map(id => Seq("user_id" -> (id: Any))), Seq("v"))
        .map(_._2("v").value)

    put(Seq((1L, "2024-01-02 00:00:00", 2.0), (2L, "2024-01-01 00:00:00", 1.0)))
    assert(get(Seq(1L, 2L)) == Seq(2.0, 1.0))
    // stale replay (older ts) must NOT overwrite
    put(Seq((1L, "2024-01-01 00:00:00", 9.9)))
    assert(get(Seq(1L)) == Seq(2.0))
    // newer write wins; replaying the SAME batch is idempotent
    put(Seq((1L, "2024-01-03 00:00:00", 3.0)))
    put(Seq((1L, "2024-01-03 00:00:00", 3.0)))
    assert(get(Seq(1L)) == Seq(3.0))
    // null event_ts round-trips as None (the _ts field is omitted, not
    // a Long.MinValue sentinel — parquet-store parity), and the row
    // stays always-overwritable (minus-infinity LWW)
    store.upsert("r", vv, Seq("user_id"),
      Seq((5L, Option.empty[java.sql.Timestamp], 7.0)).toDF("user_id", "et", "v"),
      "et", None)
    val (nullTs, nullVals) = store.read("r", vv, Seq("user_id"),
      Seq(Seq("user_id" -> (5L: Any))), Seq("v")).head
    assert(nullTs.isEmpty, s"null event_ts must read back None, got $nullTs")
    assert(nullVals("v").value == 7.0)
    // legacy-sentinel migration: a pre-r7 writer stored null ts as
    // _ts=Long.MinValue. HSET merges fields, so without the HDEL a new
    // null-ts upsert would leave the sentinel alive and the row would
    // read back as a year −292M timestamp forever.
    val sentinelKey = s"r:uv:${graft.online.EntityKeyCodec.hexKey(Seq("user_id" -> 5L))}"
    locally {
      val sock = new java.net.Socket("127.0.0.1", mini.port)
      val o = sock.getOutputStream
      val parts = Seq("HSET", sentinelKey, "_ts", Long.MinValue.toString)
      o.write(s"*${parts.length}\r\n".getBytes("UTF-8"))
      parts.foreach { p =>
        o.write(s"$$${p.length}\r\n".getBytes("UTF-8"))
        o.write(p.getBytes("UTF-8")); o.write("\r\n".getBytes("UTF-8"))
      }
      o.flush(); sock.getInputStream.read(); sock.close()
    }
    val (legacyTs, _) = store.read("r", vv, Seq("user_id"),
      Seq(Seq("user_id" -> (5L: Any))), Seq("v")).head
    assert(legacyTs.contains(new java.sql.Timestamp(Long.MinValue)),
      "precondition: the planted legacy sentinel is visible")
    store.upsert("r", vv, Seq("user_id"),
      Seq((5L, Option.empty[java.sql.Timestamp], 7.5)).toDF("user_id", "et", "v"),
      "et", None)
    val (migratedTs, migratedVals) = store.read("r", vv, Seq("user_id"),
      Seq(Seq("user_id" -> (5L: Any))), Seq("v")).head
    assert(migratedTs.isEmpty, "null-ts upsert must HDEL the legacy Long.MinValue sentinel")
    assert(migratedVals("v").value == 7.5)
    put(Seq((5L, "2024-01-01 00:00:00", 8.0)))
    assert(get(Seq(5L)) == Seq(8.0), "any real ts must beat a null-ts row")
    store.delete("r", vv, Seq("user_id"), Seq(5L).toDF("user_id"))
    // CDC delete drops the key; absent key delete is a no-op
    store.delete("r", vv, Seq("user_id"),
      Seq(1L, 42L).toDF("user_id"))
    assert(get(Seq(1L, 2L)) == Seq(null, 1.0))
    store.teardown("r", Seq(vv))
    assert(mini.keyCount == 0)
    mini.stop()
  }

  test("ReferenceRedisStore: byte-exact reference layout on the wire, full round-trip") {
    import spark.implicits._
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(java.lang.Integer.parseInt(_, 16).toByte).toArray
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    // minimal raw RESP exchange (binary-safe) for the byte-level probe
    def respCmd(port: Int, args: Seq[Array[Byte]]): Vector[Array[Byte]] = {
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val o = sock.getOutputStream
        o.write(s"*${args.length}\r\n".getBytes("UTF-8"))
        args.foreach { a =>
          o.write(s"$$${a.length}\r\n".getBytes("UTF-8")); o.write(a); o.write("\r\n".getBytes)
        }
        o.flush()
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        def line(): String = {
          val sb = new StringBuilder
          var c = in.read()
          while (c != '\r') { sb.append(c.toChar); c = in.read() }
          in.read(); sb.toString
        }
        assert(in.read().toChar == '*', "expected array reply")
        val n = line().toInt
        Vector.fill(n) {
          assert(in.read().toChar == '$')
          val len = line().toInt
          val b = new Array[Byte](len)
          in.readFully(b); in.read(); in.read()
          b
        }
      } finally sock.close()
    }

    val mini = new MiniRedis()
    val store = new graft.online.ReferenceRedisStore("127.0.0.1", mini.port)
    val fs = new FeatureStore("ref", new Registry(), store, spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    val et = new java.sql.Timestamp(1704103200L * 1000L) // 2024-01-01 10:00:00 UTC
    val view = FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl), Feature("region", GraftType.Str)),
      Duration.ZERO,
      DataFrameSource(Seq((1001L, et, 0.7, "us"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et"))
    fs.applyFeatureView(view)
    fs.materialize(Seq("stats"),
      new java.sql.Timestamp(1704067200000L), new java.sql.Timestamp(1704240000000L))

    // ---- byte level: every key/field/value equals constants computed
    // by an independent murmur3 + protobuf replay of redis.py/helpers.py
    val key = unhex("0a0372656612096472697665725f69641a0320e907") // RedisKey proto
    val flat = respCmd(mini.port, Seq("HGETALL".getBytes("UTF-8"), key))
    assert(flat.nonEmpty, "the hand-computed RedisKey bytes must address the written hash")
    val fields = flat.grouped(2).map { case Vector(f, v) => hex(f) -> hex(v) }.toMap
    def fhex(s: String): String = hex(s.getBytes("UTF-8"))
    assert(fields(fhex("_ts:stats")) === "08a09acaac06") // Timestamp{1704103200}
    assert(fields(fhex("_ex:stats")) === "08ff82d1ffaf07") // Timestamp{EX_SECONDS}
    assert(fields("d5713f9f") === "29666666666666e63f", // _mmh3(stats:conv_rate) -> Value{double 0.7}
      s"fields were ${fields.keySet}")
    assert(fields("5b304fa4") === "12027573") // _mmh3(stats:region) -> Value{string "us"}

    // ---- round-trip through the engine's own serving path
    val resp = fs.getOnlineFeatures(Seq("stats:conv_rate", "stats:region"),
      Seq(Map[String, Any]("driver_id" -> 1001L), Map[String, Any]("driver_id" -> 7L)))
    assert(resp.toMap("stats:conv_rate") === Seq(0.7, null))
    assert(resp.statuses("stats:region") === Seq("PRESENT", "NOT_FOUND"))

    // ---- write semantics are the REFERENCE's: unconditional overwrite
    // (no staleness probe — redis.py:155-166), unlike RedisOnlineStore
    store.upsert("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq((1001L, new java.sql.Timestamp(1703500000000L), 0.1, "de"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et", None)
    val after = store.read("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(Seq("driver_id" -> (1001L: Any))), Seq("conv_rate"))
    assert(after.head._2("conv_rate").value === 0.1,
      "reference semantics: an older write still overwrites")

    store.delete("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(1001L).toDF("driver_id"))
    assert(store.read("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(Seq("driver_id" -> (1001L: Any))), Seq("conv_rate"))
      .head._2("conv_rate").value == null)

    // ---- teardown is VIEW-scoped: this layout shares one hash per
    // entity across views, so tearing down one view must not destroy a
    // sibling view's fields in the same hash (review r7)
    val view2 = FeatureView("stats2", Seq("driver"),
      Seq(Feature("score", GraftType.Dbl)), Duration.ZERO,
      DataFrameSource(Seq((5L, et, 1.5))
        .toDF("driver_id", "et", "score"), "et"))
    fs.applyFeatureView(view2)
    store.upsert("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq((5L, et, 0.4, "fr")).toDF("driver_id", "et", "conv_rate", "region"), "et", None)
    store.upsert("ref", fs.registry.getFeatureView("stats2"), Seq("driver_id"),
      Seq((5L, et, 1.5)).toDF("driver_id", "et", "score"), "et", None)
    store.teardown("ref", Seq(fs.registry.getFeatureView("stats")))
    val surviving = store.read("ref", fs.registry.getFeatureView("stats2"),
      Seq("driver_id"), Seq(Seq("driver_id" -> (5L: Any))), Seq("score"))
    assert(surviving.head._2("score").value === 1.5,
      "sibling view's fields must survive a scoped teardown")
    assert(store.read("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(Seq("driver_id" -> (5L: Any))), Seq("conv_rate"))
      .head._2("conv_rate").value == null, "torn-down view's fields are gone")
    store.teardown("ref", Seq(fs.registry.getFeatureView("stats2")))
    fs.teardown()
    assert(mini.keyCount === 0,
      "tearing down every view must leave no keys (empty hashes vanish)")
    mini.stop()
  }

  test("ReferenceSqlStore: reference sqlite row layout on Derby, round-trip, delete, teardown") {
    import spark.implicits._
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val db = java.nio.file.Files.createTempDirectory("graftrefsql").toString + "/db"
    val url = graft.online.JdbcOnlineStore.derbyUrl(db)
    val store = new graft.online.ReferenceSqlStore(url)
    val fs = new FeatureStore("ref", new Registry(), store, spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    val et = new java.sql.Timestamp(1704103200L * 1000L)
    fs.applyFeatureView(FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl), Feature("region", GraftType.Str)),
      Duration.ZERO,
      DataFrameSource(Seq((1001L, et, 0.7, "us"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et")))
    fs.materialize(Seq("stats"),
      new java.sql.Timestamp(1704067200000L), new java.sql.Timestamp(1704240000000L))

    // ---- raw row level: table name, entity_key bytes, Value protos
    // against the same independently-computed constants the redis
    // fixture uses (one row per (entity_key, feature_name))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT entity_key, feature_name, value, event_ts FROM ref_stats")
      val rows = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (hex(r.getBytes(1)), r.getString(2), hex(r.getBytes(3)))).toList
      rs.close()
      val ek = "020000006472697665725f69640400000004000000e9030000"
      assert(rows.toSet === Set(
        (ek, "conv_rate", "29666666666666e63f"), // Value{double_val 0.7}
        (ek, "region", "12027573")))             // Value{string_val "us"}
    } finally conn.close()

    // ---- round-trip through the engine's serving path
    val resp = fs.getOnlineFeatures(Seq("stats:conv_rate", "stats:region"),
      Seq(Map[String, Any]("driver_id" -> 1001L), Map[String, Any]("driver_id" -> 7L)))
    assert(resp.toMap("stats:conv_rate") === Seq(0.7, null))
    assert(resp.statuses("stats:region") === Seq("PRESENT", "NOT_FOUND"))

    // ---- reference write semantics: unconditional overwrite
    store.upsert("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq((1001L, new java.sql.Timestamp(1703500000000L), 0.1, "de"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et", None)
    assert(store.read("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(Seq("driver_id" -> (1001L: Any))), Seq("conv_rate"))
      .head._2("conv_rate").value === 0.1)

    // ---- null event_ts round-trips as None (engine-wide contract)
    store.upsert("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq((77L, Option.empty[java.sql.Timestamp], 0.3, "it"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et", None)
    val (nullTs, nullVals) = store.read("ref", fs.registry.getFeatureView("stats"),
      Seq("driver_id"), Seq(Seq("driver_id" -> (77L: Any))), Seq("conv_rate")).head
    assert(nullTs.isEmpty && nullVals("conv_rate").value === 0.3)

    // ---- CDC delete, then teardown DROPs the table
    store.delete("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(1001L, 77L).toDF("driver_id"))
    assert(store.read("ref", fs.registry.getFeatureView("stats"), Seq("driver_id"),
      Seq(Seq("driver_id" -> (1001L: Any))), Seq("conv_rate"))
      .head._2("conv_rate").value == null)
    // a deletes-only view that never materialized is a NO-OP, not a
    // missing-table crash (the CDC first-batch contract)
    fs.applyFeatureView(FeatureView("never_mat", Seq("driver"),
      Seq(Feature("x", GraftType.Dbl)), Duration.ZERO,
      DataFrameSource(Seq((1L, et, 1.0)).toDF("driver_id", "et", "x"), "et")))
    store.delete("ref", fs.registry.getFeatureView("never_mat"), Seq("driver_id"),
      Seq(1L).toDF("driver_id"))
    fs.teardown()
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      intercept[java.sql.SQLException](
        conn2.createStatement().executeQuery("SELECT 1 FROM ref_stats"))
    } finally conn2.close()
  }

  test("ReferenceDocStore: document id + layout, whole-document replace, delete, teardown") {
    import spark.implicits._
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val db = java.nio.file.Files.createTempDirectory("graftrefdoc").toString + "/db"
    val url = graft.online.JdbcOnlineStore.derbyUrl(db)
    val store = new graft.online.ReferenceDocStore(url)
    val fs = new FeatureStore("ref", new Registry(), store, spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    val et = new java.sql.Timestamp(1704103200L * 1000L)
    val view = FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl), Feature("region", GraftType.Str)),
      Duration.ZERO,
      DataFrameSource(Seq((1001L, et, 0.7, "us"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et"))
    fs.applyFeatureView(view)
    fs.materialize(Seq("stats"),
      new java.sql.Timestamp(1704067200000L), new java.sql.Timestamp(1704240000000L))

    // ---- raw document level: ONE row per entity key; entity_id is the
    // byte-pinned compute_entity_id digest (the DynamoDB partition key /
    // Datastore Row name — PureSpec pins the same constant), entity_key
    // the v1 serialization, and the values map entries carry the exact
    // Value proto bytes the sqlite/redis twins store
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT entity_id, entity_key, values_doc FROM ref_stats_doc")
      val rows = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), hex(r.getBytes(2)),
          graft.online.ReferenceDocStore.decodeValues(r.getBytes(3))
            .map { case (n, b) => n -> hex(b) })).toList
      rs.close()
      assert(rows.size === 1)
      val (id, ek, values) = rows.head
      assert(id === "4502dfea47294cccf23a78c07a9fb3e5") // compute_entity_id(driver_id=1001)
      assert(ek === "020000006472697665725f69640400000004000000e9030000")
      assert(values.toMap === Map(
        "conv_rate" -> "29666666666666e63f", // Value{double_val 0.7}
        "region" -> "12027573"))             // Value{string_val "us"}
    } finally conn.close()

    // ---- round-trip through the engine's serving path
    val resp = fs.getOnlineFeatures(Seq("stats:conv_rate", "stats:region"),
      Seq(Map[String, Any]("driver_id" -> 1001L), Map[String, Any]("driver_id" -> 7L)))
    assert(resp.toMap("stats:conv_rate") === Seq(0.7, null))
    assert(resp.statuses("stats:region") === Seq("PRESENT", "NOT_FOUND"))

    // ---- put_item semantics, both halves: (a) NO staleness probe — an
    // older-ts write that arrives later still wins; (b) the WHOLE
    // document is replaced — a write carrying only conv_rate drops the
    // stored region (the per-feature-row sqlite layout would keep it)
    val narrow = view.copy(features = Seq(Feature("conv_rate", GraftType.Dbl)))
    store.upsert("ref", narrow, Seq("driver_id"),
      Seq((1001L, new java.sql.Timestamp(1703500000000L), 0.1))
        .toDF("driver_id", "et", "conv_rate"), "et", None)
    val after = store.read("ref", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> (1001L: Any))), Seq("conv_rate", "region")).head
    assert(after._2("conv_rate").value === 0.1)       // older ts overwrote
    assert(after._2("region").status === "NOT_FOUND") // document replaced
    assert(after._1.contains(new java.sql.Timestamp(1703500000000L)))

    // ---- null event_ts round-trips as None (engine-wide contract)
    store.upsert("ref", view, Seq("driver_id"),
      Seq((77L, Option.empty[java.sql.Timestamp], 0.3, "it"))
        .toDF("driver_id", "et", "conv_rate", "region"), "et", None)
    val (nullTs, nullVals) = store.read("ref", view,
      Seq("driver_id"), Seq(Seq("driver_id" -> (77L: Any))), Seq("conv_rate")).head
    assert(nullTs.isEmpty && nullVals("conv_rate").value === 0.3)

    // ---- CDC delete, never-materialized no-op, teardown DROPs
    store.delete("ref", view, Seq("driver_id"), Seq(1001L, 77L).toDF("driver_id"))
    assert(store.read("ref", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> (1001L: Any))), Seq("conv_rate"))
      .head._2("conv_rate").value == null)
    fs.applyFeatureView(FeatureView("never_mat", Seq("driver"),
      Seq(Feature("x", GraftType.Dbl)), Duration.ZERO,
      DataFrameSource(Seq((1L, et, 1.0)).toDF("driver_id", "et", "x"), "et")))
    store.delete("ref", fs.registry.getFeatureView("never_mat"), Seq("driver_id"),
      Seq(1L).toDF("driver_id"))
    fs.teardown()
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      intercept[java.sql.SQLException](
        conn2.createStatement().executeQuery("SELECT 1 FROM ref_stats_doc"))
    } finally conn2.close()
  }

  test("SkewJoin.salted equals the plain join (hot key, dup rows, inner + left); salt in the join key") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // hot key 0 with 300 rows (incl. byte-identical duplicates), tail keys 1..20
    val left = ((0 until 300).map(i => (0L, (i % 50).toDouble)) ++
      (0 until 200).map(_ => (1L + rnd.nextInt(20), rnd.nextInt(100).toDouble)))
      .toDF("k", "v")
    // right covers some keys only (left-outer nulls exercised), unique per key
    val right = (0 until 15).map(i => (i.toLong, s"r$i")).toDF("k", "tag")
    for (jt <- Seq("inner", "left")) {
      val salted = graft.operators.SkewJoin.salted(left, right, Seq("k"), 8, jt)
      val plain = left.join(right, Seq("k"), jt)
      def sorted(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).sorted
      assert(sorted(salted) === sorted(plain), s"joinType=$jt")
      assert(salted.queryExecution.executedPlan.toString.contains("__graft_salt"),
        "salt must participate in the join key")
    }
    intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.salted(left, right, Seq("k"), 8, "right")
    }
    // NESTED maps (struct<…, map>, array<map>) are rejected by xxhash64
    // just like top-level maps (ADVICE r11) — the salt must skip them
    // rather than fail analysis, and still join correctly
    val nested = left
      .withColumn("s", struct(col("v").as("d"), map(lit("a"), col("v")).as("m")))
      .withColumn("am", array(map(lit("b"), col("v"))))
    val saltedNested = graft.operators.SkewJoin.salted(nested, right, Seq("k"), 8, "inner")
    val plainNested = nested.join(right, Seq("k"), "inner")
    assert(saltedNested.count() === plainNested.count())
    assert(saltedNested.queryExecution.executedPlan.toString.contains("__graft_salt"))
  }

  test("ZOrder: Morton interleave correct; z-layout prunes row groups on BOTH dims, linear on one") {
    import spark.implicits._
    import graft.sources.ZOrder
    // interleave unit cases
    val z = Seq((1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(ZOrder.zValue2(col("a"), col("b"), 4)).as[Long].collect().toSeq
    // z(5,2): a bits {0,2} -> result bits {0,4} = 17; b bit {1} -> bit 3 = 8
    assert(z === Seq(1L, 2L, 15L, 25L))
    // 256k points uniform in [0,1024)^2, deterministic
    val pts = spark.range(1 << 18).select(
      pmod(xxhash64(col("id")), lit(1024)).cast("long").as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024)).cast("long").as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(pts, s"$tmp/z", "x", "y", bits = 10,
      numFiles = 4, rowGroupBytes = Some(64 * 1024))
    pts.repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").option("parquet.block.size", (64 * 1024).toString)
      .parquet(s"$tmp/linear")
    // rows survive both layouts
    assert(spark.read.parquet(s"$tmp/z").count() === (1L << 18))

    // fraction of row groups whose [min,max] boxes overlap the query box
    def overlapFraction(dir: String, lo: Long, hi: Long): (Int, Int) = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      var total = 0; var overlap = 0
      files.foreach { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf))
        try r.getFooter.getBlocks.forEach { blk =>
          total += 1
          val byName = blk.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def dimOverlaps(colName: String): Boolean = {
            val st = byName(colName)
            val mn = st.genericGetMin.asInstanceOf[Number].longValue
            val mx = st.genericGetMax.asInstanceOf[Number].longValue
            mx >= lo && mn <= hi
          }
          if (dimOverlaps("x") && dimOverlaps("y")) overlap += 1
        } finally r.close()
      }
      (overlap, total)
    }
    val (zo, zt) = overlapFraction(s"$tmp/z", 256, 383)
    val (lo_, lt) = overlapFraction(s"$tmp/linear", 256, 383)
    val (zf, lf) = (zo.toDouble / zt, lo_.toDouble / lt)
    // box = 1/8 x 1/8 of the space. Linear layout prunes x only -> ~1/8
    // of groups overlap; z-order keeps groups cubic -> ~1/64 overlap.
    assert(zf < lf / 2,
      s"z-order should prune at least 2x more groups: z=$zo/$zt linear=${lo_}/$lt")
  }

  test("Drift: equi-depth edges quarter a uniform baseline; psi(x, x) is exactly zero; out-of-range zValueN raises") {
    import spark.implicits._
    val base = (0 until 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val edges = graft.functions.Drift.equiDepthEdges(base, "v", 4)
    assert(edges.size === 3 && edges.forall(e => e > 100 && e < 900))
    edges.zip(Seq(250.0, 500.0, 750.0)).foreach { case (e, q) =>
      assert(math.abs(e - q) < 30, s"edge $e far from quantile $q")
    }
    // identical frames: counts equal per bin -> every term exactly 0
    val psis = graft.functions.Drift.psi(base, base, "v", edges, Seq("g"))
      .select("psi").as[Double].collect()
    assert(psis === Array(0.0))
    // 3-dim Morton: known small case + loud failure on out-of-range
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(graft.sources.ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 2))
      .as[Long].head()
    assert(z3 === 7L) // bit 0 of each dim -> result bits 0,1,2
    intercept[Exception] {
      Seq((4L, 0L, 0L)).toDF("a", "b", "c")
        .select(graft.sources.ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 2))
        .collect()
    }
  }

  test("Drift.ks: hand-computed statistic, ks(x,x)=0, binned mode matches exact on bin-aligned data") {
    import spark.implicits._
    import graft.functions.Drift
    // base {1,2,3} vs cur {3,4}: sup gap at v=2 -> |2/3 - 0| = 2/3, d_num = 4
    val base = Seq(1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(3.0, 4.0).toDF("v")
    val r = Drift.ks(base, cur, "v").select("ks", "d_num", "n_base", "n_cur").head()
    assert(r.getDouble(0) === 0.666667 && r.getLong(1) === 4L)
    assert(r.getLong(2) === 3L && r.getLong(3) === 2L)
    // identical frames -> exactly zero, per group
    val x = (0 until 500).map(i => (if (i % 2 == 0) "a" else "b", (i % 37).toDouble))
      .toDF("g", "v")
    val zeros = Drift.ks(x, x, "v", Seq("g")).select("ks").as[Double].collect()
    assert(zeros === Array(0.0, 0.0))
    // edges aligned with the data grid: binned == exact
    val exact = Drift.ks(base, cur, "v").select("d_num").as[Long].head()
    val binned = Drift.ks(base, cur, "v", Nil, Some(Seq(1.5, 2.5, 3.5)))
      .select("d_num").as[Long].head()
    assert(binned === exact)
  }

  test("AggState: merge(fromBatch(a), fromBatch(b)) == fromBatch(a ++ b), disjoint keys included") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val a = (0 until 200).map(_ => (rnd.nextInt(10).toLong, rnd.nextInt(1000) / 10.0))
    val b = (0 until 150).map(_ => ((5 + rnd.nextInt(10)).toLong, rnd.nextInt(1000) / 10.0))
    def state(rows: Seq[(Long, Double)]) =
      graft.operators.AggState.fromBatch(rows.toDF("k", "v"), Seq("k"), "v")
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(snap(graft.operators.AggState.merge(state(a), state(b))) ===
      snap(state(a ++ b)))
  }

  test("History.scd2: collapses runs, null transitions open versions, intervals chain") {
    import spark.implicits._
    val df = Seq(
      // key 1: a -> a (no-op, extends) -> b -> null -> b
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("a")),
      (1L, ts("2024-01-02 00:00:00"), 2L, Some("a")),
      (1L, ts("2024-01-03 00:00:00"), 3L, Some("b")),
      (1L, ts("2024-01-04 00:00:00"), 4L, None),
      (1L, ts("2024-01-05 00:00:00"), 5L, Some("b")),
      // key 2: single event -> one open interval
      (2L, ts("2024-01-01 12:00:00"), 6L, Some("x")))
      .toDF("k", "ts", "eid", "attr")
    val got = graft.operators.History.scd2(df, Seq("k"), "ts", Seq("attr"),
        tieBreaks = Seq("eid"))
      .select("k", "attr", "valid_from", "valid_to", "version")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
      .sortBy(t => (t._1, t._5))
    assert(got === Seq(
      (1L, Some("a"), ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 1L),
      (1L, Some("b"), ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), 2L),
      (1L, None,      ts("2024-01-04 00:00:00"), Some(ts("2024-01-05 00:00:00")), 3L),
      (1L, Some("b"), ts("2024-01-05 00:00:00"), None, 4L),
      (2L, Some("x"), ts("2024-01-01 12:00:00"), None, 1L)))
  }

  test("History.sessionize: gap strictly greater than gapSeconds cuts; equal gap does not") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 00:10:00"), 2L, 2.0),  // exactly 600s: same session
      (1L, ts("2024-01-01 00:20:01"), 3L, 3.0))  // 601s: new session
      .toDF("k", "ts", "eid", "v")
    val got = graft.operators.History.sessionize(df, Seq("k"), "ts", 600,
        tieBreaks = Seq("eid"), aggs = Seq(sum(col("v")).as("sv")))
      .select("k", "session_idx", "n_events", "sv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._2)
    assert(got === Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0)))
  }

  test("sources.ZOrder.zValue2 and functions.ZOrder.interleave share one bit placement (drift tripwire)") {
    import spark.implicits._
    // two Morton implementations exist on purpose (mask-total for
    // oracles vs raise-strict for layout writes) — their bit contract
    // must never drift apart
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (255L, 17L), (1023L, 1023L))
      .toDF("a", "b")
    val got = df.select(
      graft.sources.ZOrder.zValue2(col("a"), col("b"), bits = 10).as("s"),
      graft.functions.ZOrder.interleave(col("a"), col("b"), bits = 10).as("f"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("DatePartition.compact rewrites only fragmented partitions; data intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt").toString + "/log"
    // day 1: fragmented (8 files); day 2: already compact (1 file)
    val day1 = (0 until 800).map(i => (i.toLong, ts("2024-01-01 10:00:00"), i * 1.0))
      .toDF("user_id", "et", "v").repartition(8)
    val day2 = (0 until 100).map(i => (i.toLong, ts("2024-01-02 10:00:00"), i * 1.0))
      .toDF("user_id", "et", "v").coalesce(1)
    graft.sources.DatePartition.write(day1, dir, "et", "event_date")
    graft.sources.DatePartition.write(day2, dir, "et", "event_date", mode = "append")
    def files(p: String) = new java.io.File(s"$dir/event_date=$p").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files("2024-01-01") === 8 && files("2024-01-02") === 1)
    val done = graft.sources.DatePartition.compact(spark, dir, "event_date",
      targetBytes = 1L << 30, maxFiles = 4)
    assert(done === Seq(("event_date=2024-01-01", 8, 1)))
    assert(files("2024-01-01") === 1 && files("2024-01-02") === 1)
    val total = spark.read.parquet(dir).groupBy("event_date").count()
      .as[(java.sql.Date, Long)].collect().toMap
    assert(total.values.toSeq.sorted === Seq(100L, 800L))
    // idempotent
    assert(graft.sources.DatePartition.compact(spark, dir, "event_date",
      targetBytes = 1L << 30, maxFiles = 4).isEmpty)

    // crash window: death between the two swap renames leaves the
    // partition only in _compact_old_* — the next compact run must
    // restore it, not leave it invisible forever (review r6)
    val live = new java.io.File(s"$dir/event_date=2024-01-02")
    val orphan = new java.io.File(s"$dir/_compact_old_event_date=2024-01-02")
    assert(live.renameTo(orphan))
    assert(!live.exists())
    graft.sources.DatePartition.compact(spark, dir, "event_date",
      targetBytes = 1L << 30, maxFiles = 4)
    assert(live.exists() && !orphan.exists(), "crashed partition restored")
    assert(spark.read.parquet(dir).count() === 900L)
  }

  test("DatePartition.vacuum drops only expired partitions; survivors still read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toString + "/log"
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-02 10:00:00"), 2.0),
      (3L, ts("2024-01-03 10:00:00"), 3.0))
      .toDF("user_id", "et", "v")
    graft.sources.DatePartition.write(df, dir, "et", "event_date")
    val dropped = graft.sources.DatePartition.vacuum(
      spark, dir, "event_date", java.time.LocalDate.parse("2024-01-03"))
    assert(dropped === Seq("event_date=2024-01-01", "event_date=2024-01-02"))
    val left = spark.read.parquet(dir).select("user_id").as[Long].collect().toSeq
    assert(left === Seq(3L))
    // idempotent; nothing newer is touched
    assert(graft.sources.DatePartition.vacuum(
      spark, dir, "event_date", java.time.LocalDate.parse("2024-01-03")).isEmpty)
    // missing path is a no-op, not an error
    assert(graft.sources.DatePartition.vacuum(
      spark, dir + "_nope", "event_date", java.time.LocalDate.parse("2024-01-03")).isEmpty)
  }

  test("LabelJoin: strict lower edge (leakage guard), horizon bound, earliest-wins ties") {
    import spark.implicits._
    import graft.operators.LabelJoin
    val entity = Seq((10L, 1L, ts("2024-01-10 00:00:00")))
      .toDF("anchor_id", "user_id", "event_timestamp")
    val labels = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100L, 1.0), // AT anchor ts → excluded (leakage)
      (1L, ts("2024-01-11 00:00:00"), 101L, 2.0), // earliest after → the label
      (1L, ts("2024-01-11 00:00:00"), 102L, 3.0), // same ts, larger id → tie loses
      (1L, ts("2024-01-13 00:00:00"), 103L, 4.0)) // beyond 2-day horizon → excluded
      .toDF("user_id", "ts", "label_event_id", "label_value")
    val got = LabelJoin.join(entity, labels, Seq("user_id"),
        Seq("label_event_id", "label_value"), java.time.Duration.ofDays(2),
        labelTsCol = "ts", tieBreaks = Seq("label_event_id"))
      .select("anchor_id", "label_event_id", "label_value").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 101L && got(0).getDouble(2) == 2.0)
    // horizon edge is inclusive: a label exactly at +2 days qualifies
    val edge = Seq((1L, ts("2024-01-12 00:00:00"), 200L, 9.0))
      .toDF("user_id", "ts", "label_event_id", "label_value")
    val got2 = LabelJoin.join(entity, edge, Seq("user_id"),
        Seq("label_event_id", "label_value"), java.time.Duration.ofDays(2),
        labelTsCol = "ts")
      .select("label_event_id").collect()
    assert(got2(0).getLong(0) == 200L)
    // no label in window → left row survives with nulls
    val none = LabelJoin.join(entity, labels.filter(col("label_event_id") === 103L),
        Seq("user_id"), Seq("label_event_id", "label_value"),
        java.time.Duration.ofDays(2), labelTsCol = "ts").collect()
    assert(none.length == 1 && none(0).isNullAt(none(0).fieldIndex("label_value")))
    // sub-second horizon is honored at µs granularity (review r4: a
    // seconds-truncated interval made a 500ms window empty)
    val subSec = Seq((1L, new java.sql.Timestamp(
        ts("2024-01-10 00:00:00").getTime + 300L), 300L, 7.0))
      .toDF("user_id", "ts", "label_event_id", "label_value")
    val got3 = LabelJoin.join(entity, subSec, Seq("user_id"),
        Seq("label_event_id", "label_value"), java.time.Duration.ofMillis(500),
        labelTsCol = "ts")
      .select("label_event_id").collect()
    assert(got3(0).getLong(0) == 300L)
  }

  test("as-of family guards: empty keys and output-name collisions fail loudly (review r6)") {
    import spark.implicits._
    import graft.operators.{LabelJoin, NearestJoin}
    val entity = Seq((1L, ts("2024-01-10 00:00:00"), 0.0))
      .toDF("user_id", "event_timestamp", "label_value")
    val labels = Seq((1L, ts("2024-01-11 00:00:00"), 2.0))
      .toDF("user_id", "ts", "label_value")
    intercept[IllegalArgumentException](
      LabelJoin.join(entity, labels, Nil, Seq("label_value"),
        java.time.Duration.ofDays(2), labelTsCol = "ts"))
    // entity already carries label_value: the join-back would duplicate it
    val e2 = intercept[IllegalArgumentException](
      LabelJoin.join(entity, labels, Seq("user_id"), Seq("label_value"),
        java.time.Duration.ofDays(2), labelTsCol = "ts"))
    assert(e2.getMessage.contains("label_value"))
    intercept[IllegalArgumentException](
      NearestJoin.join(entity.withColumnRenamed("label_value", "matched_ts"),
        labels, Seq("user_id"), Seq("label_value"),
        java.time.Duration.ofDays(2), featureTsCol = "ts"))
  }

  test("cdcApply: NULL op fails loudly; duplicate-orderCols ties collapse by the shared LWW order (review r6)") {
    import spark.implicits._
    import graft.operators.Merge
    val base = Seq((1L, "a", 1.0)).toDF("k", "t", "v")
    val nullOp = Seq((2L, None.orNull.asInstanceOf[String], "z", 2.0, 5L))
      .toDF("k", "op", "t", "v", "seq")
    val e = intercept[Exception] {
      Merge.cdcApply(base, nullOp, Seq("k"), "op", Seq("seq"), Seq("t", "v")).collect()
    }
    assert(e.getMessage.contains("NULL op"))
    // same seq for an upsert and a delete of one key: the payload tail
    // ('U' > 'D' in the max) makes the upsert win DETERMINISTICALLY —
    // the bare struct(orderCols) order left this to partitioning luck
    val tied = Seq(
      (1L, "U", Some("b"), Some(9.0), 5L),
      (1L, "D", None: Option[String], None: Option[Double], 5L))
      .toDF("k", "op", "t", "v", "seq").repartition(4)
    (1 to 3).foreach { _ =>
      val out = Merge.cdcApply(base, tied, Seq("k"), "op", Seq("seq"), Seq("t", "v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(out.toSeq === Seq((1L, "b", 9.0)))
    }
  }

  test("SnapshotDiff: ADDED / REMOVED / CHANGED reported, unchanged dropped") {
    import spark.implicits._
    import graft.operators.SnapshotDiff
    val before = Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "c"))
      .toDF("k", "v", "t")
    val after = Seq((1L, 1.0, "a"), (2L, 2.5, "b"), (4L, 4.0, "d"))
      .toDF("k", "v", "t")
    val got = SnapshotDiff.diff(before, after, Seq("k"), Seq("v", "t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "CHANGED", 3L -> "REMOVED", 4L -> "ADDED"))
  }

  test("VersionedTable: snapshot/append commits, pinned reads, torn manifests, vacuum GC") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_vt").toString
    // v1 snapshot, v2 append, v3 snapshot (replaces everything)
    val v1 = VersionedTable.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "t"))
    val v2 = VersionedTable.commit(spark, dir, Seq((3L, "c")).toDF("k", "t"), append = true)
    val v3 = VersionedTable.commit(spark, dir, Seq((9L, "z")).toDF("k", "t"))
    assert((v1, v2, v3) === ((1, 2, 3)))
    assert(VersionedTable.read(spark, dir, Some(1)).count() === 2)
    assert(VersionedTable.read(spark, dir, Some(2)).count() === 3)
    assert(VersionedTable.read(spark, dir).as[(Long, String)].collect().toSet === Set((9L, "z")))

    // torn manifest: claimed v4 but died mid-write -> invisible to
    // reads; a stray non-numeric manifest name is ignored, not a crash
    val torn = new java.io.File(s"$dir/_manifests/v${"%010d".format(4)}.json")
    java.nio.file.Files.write(torn.toPath, """{"version":4,"files":["data/x""".getBytes)
    val stray = new java.io.File(s"$dir/_manifests/v0000000003 (copy).json")
    java.nio.file.Files.write(stray.toPath, "junk".getBytes)
    assert(VersionedTable.versions(spark, dir) === Seq(1, 2, 3))
    assert(VersionedTable.read(spark, dir).count() === 1) // still v3

    // APPENDS refuse to chain over the torn slot (its claimant might
    // still complete — skipping it was the lost-update bug, review r6);
    // snapshots are unaffected. vacuum clears the wreckage.
    intercept[java.io.IOException] {
      VersionedTable.commit(spark, dir, Seq((10L, "y")).toDF("k", "t"),
        append = true, maxRetries = 3)
    }
    val v5 = VersionedTable.commit(spark, dir, Seq((9L, "z"), (10L, "y")).toDF("k", "t"))
    assert(v5 === 5)

    // vacuum to the 2 newest valid versions: v1/v2 manifests + their
    // now-unreferenced data files, the torn v4 manifest, and the stray
    // name all go
    val (dropped, deleted) = VersionedTable.vacuum(spark, dir, keepLast = 2)
    assert(dropped === Seq(1, 2) && deleted > 0)
    assert(!torn.exists())
    assert(VersionedTable.versions(spark, dir) === Seq(3, 5))
    assert(VersionedTable.read(spark, dir, Some(3)).count() === 1) // kept reads intact
    assert(VersionedTable.read(spark, dir, Some(5)).count() === 2)
    intercept[java.util.NoSuchElementException] {
      VersionedTable.read(spark, dir, Some(1))
    }
    // with the wreckage gone, appends flow again and chain off v5
    val v6 = VersionedTable.commit(spark, dir, Seq((11L, "w")).toDF("k", "t"), append = true)
    assert(v6 === 6)
    assert(VersionedTable.read(spark, dir).as[(Long, String)].collect().toSet
      === Set((9L, "z"), (10L, "y"), (11L, "w")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("VersionedTable: empty snapshot stays TYPED; concurrent appends never lose a commit (review r6)") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_vt2").toString
    // empty snapshot: the schema must survive so column refs resolve
    val empty = Seq.empty[(Long, String)].toDF("k", "t")
    VersionedTable.commit(spark, dir, empty)
    val back = VersionedTable.read(spark, dir)
    assert(back.count() === 0L)
    assert(back.filter(col("k") > 0).count() === 0L, "typed empty frame resolves columns")

    // concurrent appenders: every committed row must reach the head
    // (the two-listing race silently dropped an interleaved commit)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        VersionedTable.commit(spark, dir,
          Seq((i.toLong, s"t$i")).toDF("k", "t"), append = true, maxRetries = 30)
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val head = VersionedTable.read(spark, dir).as[(Long, String)].collect().toSet
    assert(head === Set((1L, "t1"), (2L, "t2"), (3L, "t3"), (4L, "t4")),
      s"lost update: head = $head")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("VersionedTable.commitAudited: failed audit publishes nothing, passing audit publishes") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import graft.functions.Validate
    val dir = java.nio.file.Files.createTempDirectory("graft_wap").toString
    val v1 = VersionedTable.commit(spark, dir, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    assert(v1 === 1)
    val rules = Seq(
      Validate.Rule("k_nonnull", col("k").isNotNull),
      Validate.Rule("v_positive", col("v") > 0))

    // bad batch: one negative value -> audit fails, head stays at v1,
    // staged files are gone
    val (vBad, repBad) = VersionedTable.commitAudited(spark, dir,
      Seq((3L, -5.0), (4L, 40.0)).toDF("k", "v"), rules, append = true)
    assert(vBad.isEmpty)
    val bad = repBad.collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(bad("v_positive") === ((1L, false)) && bad("k_nonnull") === ((0L, true)))
    assert(VersionedTable.versions(spark, dir) === Seq(1))
    assert(VersionedTable.read(spark, dir).count() === 2)
    val dataDirs = new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
    assert(dataDirs.length === 1, "failed audit must delete its staged dir")

    // good batch publishes as the next version (torn slots unaffected)
    val (vOk, repOk) = VersionedTable.commitAudited(spark, dir,
      Seq((3L, 30.0)).toDF("k", "v"), rules, append = true)
    assert(vOk === Some(2))
    assert(repOk.collect().forall(_.getBoolean(3)))
    assert(VersionedTable.read(spark, dir).count() === 3)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("WAP + streaming CDC composed: stage/claim crash invisible, bad batch unpublished, resume exactly-once") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import graft.functions.Validate
    val base = java.nio.file.Files.createTempDirectory("graft_wapcdc").toString
    val input = s"$base/in"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
    new java.io.File(input).mkdirs()
    val rules = Seq(
      Validate.Rule("key_nonnull", col("user_id").isNotNull),
      Validate.Rule("op_valid", col("op").isin("U", "D")))
    var rejected = 0
    def runStream(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, v DOUBLE, op STRING").parquet(input)
      val q = stream.writeStream
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            // the CDC collapse (net change per key within the batch),
            // then a WAP-audited append of the net changelog — the
            // composition under test
            val net = batch.groupBy("user_id")
              .agg(max_by(struct(col("ts"), col("v"), col("op")),
                struct(col("ts"))).as("n"))
              .select(col("user_id"), col("n.ts").as("ts"),
                col("n.v").as("v"), col("n.op").as("op"))
            val (v, _) = VersionedTable.commitAudited(spark, table, net, rules, append = true)
            if (v.isEmpty) rejected += 1
          }
          ()
        }.start()
      q.awaitTermination()
    }
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def addFile(rows: Seq[(Long, java.sql.Timestamp, Double, String)], name: String): Unit =
      rows.toDF("user_id", "ts", "v", "op").coalesce(1)
        .write.parquet(s"$base/stage_$name") // stage then move one file in
    def publish(name: String): Unit = {
      val f = new java.io.File(s"$base/stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(input, s"$name.parquet"))
    }

    addFile(Seq((1L, t("2024-01-01 10:00:00"), 1.0, "U"),
      (2L, t("2024-01-01 10:00:00"), 2.0, "U")), "b1"); publish("b1")
    runStream()
    assert(VersionedTable.versions(spark, table) === Seq(1))

    // crash injection: a staged-but-unclaimed commit dir is EXACTLY the
    // on-disk state a writer crash between stage() and the manifest
    // claim leaves behind
    Seq((99L, t("2024-01-01 11:00:00"), 666.0, "U"))
      .toDF("user_id", "ts", "v", "op").write.parquet(s"$table/data/commit-dead")
    assert(VersionedTable.read(spark, table)
      .filter(col("user_id") === 99L).count() === 0L,
      "a reader must never see staged-but-unclaimed files")

    // bad batch: invalid op fails the audit -> nothing publishes
    addFile(Seq((3L, t("2024-01-01 12:00:00"), 3.0, "X")), "b2"); publish("b2")
    runStream()
    assert(rejected === 1)
    assert(VersionedTable.versions(spark, table) === Seq(1),
      "a failed audit must not advance the table")

    // good batch after the crash debris + rejected batch: resume
    // processes ONLY the new file (checkpoint exactly-once) and appends
    addFile(Seq((1L, t("2024-01-02 10:00:00"), 1.5, "U"),
      (2L, t("2024-01-02 10:00:00"), 0.0, "D")), "b3"); publish("b3")
    runStream()
    assert(rejected === 1)
    assert(VersionedTable.versions(spark, table) === Seq(1, 2))
    val log = VersionedTable.read(spark, table)
    assert(log.count() === 4L, "changelog = batch1 (2 rows) + batch3 (2 rows), nothing replayed")
    assert(log.filter(col("user_id") === 99L || col("user_id") === 3L).count() === 0L)
    // reconstructed state: latest per key honoring tombstones
    val state = log.groupBy("user_id")
      .agg(max_by(struct(col("ts"), col("v"), col("op")), struct(col("ts"))).as("n"))
      .filter(col("n.op") =!= "D")
      .select(col("user_id"), col("n.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(state === Map(1L -> 1.5))

    // vacuum clears the crashed writer's orphan files; live data intact
    VersionedTable.vacuum(spark, table, keepLast = 2)
    assert(!new java.io.File(s"$table/data/commit-dead").exists() ||
      new java.io.File(s"$table/data/commit-dead").listFiles()
        .forall(!_.getName.endsWith(".parquet")),
      "vacuum must delete unreferenced staged files")
    assert(VersionedTable.read(spark, table).count() === 4L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("Merge.cdcApply: LWW collapse, tombstones, re-inserts, unseen-key deletes, pass-through") {
    import spark.implicits._
    import graft.operators.Merge
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
      .toDF("k", "t", "v")
    // k=1 untouched; k=2 updated twice (second wins); k=3 U then D (deleted);
    // k=5 D then U (re-insert survives); k=6 fresh insert; k=7 delete of unseen key (no-op)
    val changes = Seq(
      (2L, "U", "b1", 20.0, 1L), (2L, "U", "b2", 21.0, 2L),
      (3L, "U", "c1", 30.0, 1L), (3L, "D", null, 0.0, 2L),
      (5L, "D", null, 0.0, 1L), (5L, "U", "e", 50.0, 2L),
      (6L, "U", "f", 60.0, 1L),
      (7L, "D", null, 0.0, 1L))
      .toDF("k", "op", "t", "v", "seq")
    val got = Merge.cdcApply(base, changes, Seq("k"), "op", Seq("seq"), Seq("t", "v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got === Map(
      1L -> ("a", 1.0), 2L -> ("b2", 21.0), 4L -> ("d", 4.0),
      5L -> ("e", 50.0), 6L -> ("f", 60.0)))
  }

  test("online staleness: rows older than ttl read back OUTSIDE_MAX_AGE, value retained") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0.5),   // stale at asOf below
      (2L, ts("2024-01-05 10:00:00"), 0.7))   // fresh
      .toDF("driver_id", "et", "conv_rate")
    val fs = new FeatureStore("ttl_t", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("stale_v", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl)), Duration.ofDays(2),
      DataFrameSource(df, "et")))
    fs.materialize(Seq("stale_v"), ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00"))

    val rows = Seq(1L, 2L, 99L).map(id => Map[String, Any]("driver_id" -> id))
    val resp = fs.getOnlineFeatures(Seq("stale_v:conv_rate"), rows,
      asOf = Some(ts("2024-01-06 00:00:00")))
    val stats = resp.statuses("stale_v:conv_rate")
    val vals = resp.toMap("stale_v:conv_rate")
    assert(stats == Seq("OUTSIDE_MAX_AGE", "PRESENT", "NOT_FOUND"))
    assert(vals(0) == 0.5, "stale value is still returned (reference contract)")
    assert(vals(1) == 0.7)
    // ttl == 0 disables the gate entirely (same view data, zero-ttl view)
    fs.applyFeatureView(FeatureView("nottl_v", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl)), Duration.ZERO,
      DataFrameSource(df, "et")))
    fs.materialize(Seq("nottl_v"), ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00"))
    val resp2 = fs.getOnlineFeatures(Seq("nottl_v:conv_rate"), rows.take(1),
      asOf = Some(ts("2030-01-01 00:00:00")))
    assert(resp2.statuses("nottl_v:conv_rate") == Seq("PRESENT"))
    fs.teardown()
  }

  test("materializeBackfill: chunked slices, skip-covered resume, idempotent rerun") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (i % 20L, new Timestamp(ts("2024-01-01 00:00:00").getTime + i * 3600_000L * 3), i.toDouble)
    }
    val df = rows.toDF("driver_id", "et", "v")
    val fs = new FeatureStore("bf", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, joinKeyOpt = Some("driver_id")))
    fs.applyFeatureView(FeatureView("bf_v", Seq("driver"),
      Seq(Feature("v", GraftType.Dbl)), Duration.ZERO, DataFrameSource(df, "et")))
    // pre-cover the first week, as a crashed earlier backfill would have
    fs.materialize(Seq("bf_v"), ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00"))
    val run = fs.materializeBackfill(Seq("bf_v"),
      ts("2024-01-01 00:00:00"), ts("2024-01-26 00:00:00"), java.time.Duration.ofDays(7))
    // 4 slices total (last one short); the covered first is skipped
    assert(run.map(r => (r._1.toString, r._2.toString)) === Seq(
      ("2024-01-08 00:00:00.0", "2024-01-15 00:00:00.0"),
      ("2024-01-15 00:00:00.0", "2024-01-22 00:00:00.0"),
      ("2024-01-22 00:00:00.0", "2024-01-26 00:00:00.0")))
    // all keys online with their latest value in range
    val resp = fs.getOnlineFeatures(Seq("bf_v:v"),
      (0L until 20L).map(k => Map[String, Any]("driver_id" -> k)))
    assert(resp.statuses("bf_v:v").forall(_ == "PRESENT"))
    // rerun: everything covered now -> nothing runs
    assert(fs.materializeBackfill(Seq("bf_v"),
      ts("2024-01-01 00:00:00"), ts("2024-01-26 00:00:00"),
      java.time.Duration.ofDays(7)).isEmpty)
    fs.teardown()
  }

  test("ParquetOnlineStore.expire: drops only aged rows, rewrites only touched buckets, idempotent") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftexp").toString
    val store = new ParquetOnlineStore(base, numBuckets = 8, smallStoreBytes = 0L)
    // even keys old (expired), odd keys fresh, key 100 has NULL ts
    // (must SURVIVE the sweep: "not expired" on discovery must mean
    // "kept" on rewrite)
    val df = ((0L until 64L).map(k =>
        (k, if (k % 2 == 0) ts("2024-01-01 00:00:00") else ts("2024-01-20 00:00:00"), k.toDouble)) :+
        ((100L, null.asInstanceOf[Timestamp], 100.0)))
      .toDF("driver_id", "et", "v")
    val view = FeatureView("ev", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, "et"))
    store.upsert("p", view, Seq("driver_id"), df, "et", None)

    def fileStamps(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(s"$base/p/ev")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).toSet
        }.toMap
    }

    val expired = store.expire(spark, "p", view, Seq("driver_id"), "et",
      ts("2024-01-10 00:00:00"))
    assert(expired === 32L)
    val snap = store.tableDf(spark, "p", "ev").select("driver_id").as[Long].collect().toSet
    assert(snap === ((1L until 64L by 2).toSet + 100L))
    // survivors readable; expired keys NOT_FOUND
    val r = store.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 3L), Seq("driver_id" -> 4L)), Seq("v"))
    assert(r(0)._2("v").status == "PRESENT" && r(0)._2("v").value == 3.0)
    assert(r(1)._2("v").status == "NOT_FOUND")
    // nothing left to expire: no rewrite happens (file stamps unchanged)
    val stamps = fileStamps()
    assert(store.expire(spark, "p", view, Seq("driver_id"), "et",
      ts("2024-01-10 00:00:00")) === 0L)
    assert(fileStamps() === stamps)
    // cutoff = 0 on a FeatureStore view with ttl=0 is a no-op by contract
    store.teardown("p", Seq(view))
  }

  test("OnlineStore.delete: keyed tombstones across all three stores; absent keys no-op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftdel").toString
    val stores: Seq[(String, graft.online.OnlineStore)] = Seq(
      "parquet" -> new ParquetOnlineStore(s"$base/pq", numBuckets = 4, smallStoreBytes = 0L),
      "memory" -> new InMemoryOnlineStore(),
      "jdbc" -> new graft.online.JdbcOnlineStore(
        s"jdbc:derby:$base/derby;create=true"))
    val df = (0L until 20L).map(k => (k, ts("2024-01-01 00:00:00"), k.toDouble))
      .toDF("driver_id", "et", "v")
    val view = FeatureView("dv", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, "et"))
    stores.foreach { case (name, store) =>
      store.upsert("p", view, Seq("driver_id"), df, "et", None)
      // delete evens + an absent key (100): odd keys untouched
      val dels = ((0L until 20L by 2) :+ 100L).toDF("driver_id")
      store.delete("p", view, Seq("driver_id"), dels)
      val r = store.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 2L), Seq("driver_id" -> 3L)), Seq("v"))
      assert(r(0)._2("v").status == "NOT_FOUND", s"$name: deleted key must be gone")
      assert(r(1)._2("v").status == "PRESENT" && r(1)._2("v").value == 3.0,
        s"$name: neighbor must survive")
      store.teardown("p", Seq(view))
    }
  }

  test("ParquetOnlineStore: small-store rewrite preserves the ADOPTED bucket marker (review r12)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftmk").toString
    val df1 = (0L until 40L).map(k => (k, ts("2024-01-01 10:00:00"), k.toDouble))
      .toDF("driver_id", "et", "v")
    val view = FeatureView("mk", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df1, "et"))
    // created with 8 buckets (default smallStoreBytes -> small-store path)
    new ParquetOnlineStore(base, numBuckets = 8)
      .upsert("p", view, Seq("driver_id"), df1, "et", None)
    def marker(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/p/mk/_graft_buckets")), "UTF-8").trim
    assert(marker() === "8")
    // reopened with a DIFFERENT configured count: the rewrite must keep
    // writing the adopted 8 — pre-fix it published mod-8 data under a
    // marker saying 4, misrouting every later point read
    val store4 = new ParquetOnlineStore(base, numBuckets = 4)
    val df2 = (40L until 48L).map(k => (k, ts("2024-01-02 10:00:00"), k.toDouble))
      .toDF("driver_id", "et", "v")
    store4.upsert("p", view, Seq("driver_id"), df2, "et", None)
    assert(marker() === "8", "rewrite must persist the adopted count, not the configured one")
    val r = store4.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 3L), Seq("driver_id" -> 44L)), Seq("v"))
    assert(r(0)._2("v").status == "PRESENT" && r(0)._2("v").value == 3.0)
    assert(r(1)._2("v").status == "PRESENT" && r(1)._2("v").value == 44.0)
    store4.teardown("p", Seq(view))
  }

  test("ParquetOnlineStore: delete heals a crashed whole-table swap instead of no-opping (review r12)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftheal").toString
    val store = new ParquetOnlineStore(base, numBuckets = 4)
    val df = (0L until 10L).map(k => (k, ts("2024-01-01 10:00:00"), k.toDouble))
      .toDF("driver_id", "et", "v")
    val view = FeatureView("hl", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, "et"))
    store.upsert("p", view, Seq("driver_id"), df, "et", None)
    // simulate a crash between rename-aside and rename-in: the whole
    // table is parked at `.old`, the live tree is gone
    val live = new java.io.File(s"$base/p/hl")
    assert(live.renameTo(new java.io.File(s"$base/p/hl.old")))
    // pre-fix: delete saw !exists(live) and returned silently, while
    // reads kept serving via the .old fallback and the next upsert
    // resurrected the tombstoned keys
    store.delete("p", view, Seq("driver_id"), Seq(2L).toDF("driver_id"))
    val r = store.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 2L), Seq("driver_id" -> 3L)), Seq("v"))
    assert(r(0)._2("v").status == "NOT_FOUND", "tombstone must apply through the heal")
    assert(r(1)._2("v").status == "PRESENT" && r(1)._2("v").value == 3.0)
    store.teardown("p", Seq(view))
  }

  test("InMemoryOnlineStore tolerates null event ts: no NPE, ts-less read, real ts supersedes (review r12)") {
    import spark.implicits._
    val store = new InMemoryOnlineStore()
    val nullDf = Seq((7L, null.asInstanceOf[Timestamp], 1.0)).toDF("driver_id", "et", "v")
    val view = FeatureView("nt", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(nullDf, "et"))
    store.upsert("p", view, Seq("driver_id"), nullDf, "et", None)
    // second null-ts upsert exercised the LWW compare that NPE'd pre-fix
    store.upsert("p", view, Seq("driver_id"), nullDf, "et", None)
    val r0 = store.read("p", view, Seq("driver_id"), Seq(Seq("driver_id" -> 7L)), Seq("v"))
    assert(r0.head._1.isEmpty, "stored null ts must read as ts-less, not Some(null)")
    assert(r0.head._2("v").value == 1.0)
    // any timestamped row supersedes the null-ts row
    val tsDf = Seq((7L, ts("2024-01-05 00:00:00"), 2.0)).toDF("driver_id", "et", "v")
    store.upsert("p", view, Seq("driver_id"), tsDf, "et", None)
    val r1 = store.read("p", view, Seq("driver_id"), Seq(Seq("driver_id" -> 7L)), Seq("v"))
    assert(r1.head._1.contains(ts("2024-01-05 00:00:00")) && r1.head._2("v").value == 2.0)
    store.teardown("p", Seq(view))
  }

  test("serving cache invalidation is view-scoped: writing 'clicks' keeps 'clicks_v2' hot (review r12)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftsib").toString
    val store = new ParquetOnlineStore(base, numBuckets = 2)
    def mkView(n: String, df: org.apache.spark.sql.DataFrame) =
      FeatureView(n, Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
        Duration.ZERO, DataFrameSource(df, "et"))
    val df = (0L until 8L).map(k => (k, ts("2024-01-01 10:00:00"), k.toDouble))
      .toDF("driver_id", "et", "v")
    val (v1, v2) = (mkView("clicks", df), mkView("clicks_v2", df))
    store.upsert("p", v1, Seq("driver_id"), df, "et", None)
    store.upsert("p", v2, Seq("driver_id"), df, "et", None)
    // fill both views' decoded-bucket caches
    store.read("p", v1, Seq("driver_id"), Seq(Seq("driver_id" -> 1L)), Seq("v"))
    store.read("p", v2, Seq("driver_id"), Seq(Seq("driver_id" -> 1L)), Seq("v"))
    val v2Cached = ParquetOnlineStore.cachedPaths().filter(_.contains("/clicks_v2/"))
    assert(v2Cached.nonEmpty, "precondition: clicks_v2 buckets cached")
    // a write to the SIBLING-NAMED view must not evict clicks_v2's blocks
    store.upsert("p", v1, Seq("driver_id"),
      Seq((9L, ts("2024-01-02 10:00:00"), 9.0)).toDF("driver_id", "et", "v"), "et", None)
    assert(v2Cached.subsetOf(ParquetOnlineStore.cachedPaths()),
      "clicks_v2 cache entries must survive a write to clicks")
    assert(!ParquetOnlineStore.cachedPaths().exists(p => p.contains("/clicks/")),
      "clicks' own cache entries must be invalidated by its write")
    store.teardown("p", Seq(v1, v2))
  }

  test("ParquetOnlineStore.read resolves the stream source's ts column for the staleness gate (review r12)") {
    import spark.implicits._
    // batch and stream sources name their event-ts differently; the
    // stream materializer upserts under the STREAM name — the read
    // previously looked up only the batch name, got None, and silently
    // disabled the ttl gate
    val base = java.nio.file.Files.createTempDirectory("graftts").toString
    val store = new ParquetOnlineStore(base, numBuckets = 2)
    val batchDf = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("driver_id", "event_timestamp", "v")
    val streamDf = Seq((1L, ts("2024-01-03 00:00:00"), 3.0)).toDF("driver_id", "evt_ts", "v")
    val view = FeatureView("tsv", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ofDays(7), DataFrameSource(batchDf, "event_timestamp"),
      streamSource = Some(DataFrameSource(streamDf, "evt_ts")))
    store.upsert("p", view, Seq("driver_id"), streamDf, "evt_ts", None)
    val r = store.read("p", view, Seq("driver_id"), Seq(Seq("driver_id" -> 1L)), Seq("v"))
    assert(r.head._1.contains(ts("2024-01-03 00:00:00")),
      "read must find the event ts under the stream source's column name")
    store.teardown("p", Seq(view))
  }

  test("ParquetOnlineStore upsert rewrites only buckets containing incoming keys") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftbkt").toString
    // smallStoreBytes=0 forces the incremental (touched-buckets) path
    // regardless of store size — the property under test.
    val store = new ParquetOnlineStore(base, numBuckets = 8, smallStoreBytes = 0L)
    val df1 = (0L until 64L).map(k => (k, ts("2024-01-01 10:00:00"), k.toDouble))
      .toDF("driver_id", "et", "v")
    val view = FeatureView("bv", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df1, "et"))
    // reading a store that was never written: NOT_FOUND, not an exception
    val empty = store.read("p", view, Seq("driver_id"), Seq(Seq("driver_id" -> 1L)), Seq("v"))
    assert(empty.head._2("v").status == "NOT_FOUND")
    store.upsert("p", view, Seq("driver_id"), df1, "et", None)

    // per-bucket parquet file listing (name -> size) under the view dir
    def listing(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(s"$base/p/bv")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length())).toSet
        }.toMap
    }
    val before = listing()
    assert(before.size > 1, "64 keys over 8 buckets should populate several buckets")

    // second upsert touching exactly one key
    val df2 = Seq((5L, ts("2024-01-02 10:00:00"), 99.0)).toDF("driver_id", "et", "v")
    store.upsert("p", view, Seq("driver_id"), df2, "et", None)
    val after = listing()
    val changed = (before.keySet ++ after.keySet).filter(b => before.get(b) != after.get(b))
    assert(changed.size == 1, s"exactly one bucket dir should change, got $changed")

    // data intact: 64 keys, key 5 updated, neighbors untouched
    val snap = store.tableDf(spark, "p", "bv").collect()
      .map(r => r.getAs[Long]("driver_id") -> r.getAs[Double]("v")).toMap
    assert(snap.size == 64 && snap(5L) == 99.0 && snap(6L) == 6.0)

    // point reads prune to the requested buckets and return the merge
    val got = store.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 5L), Seq("driver_id" -> 6L), Seq("driver_id" -> 999L)),
      Seq("v"))
    assert(got(0)._2("v").value == 99.0)
    assert(got(1)._2("v").value == 6.0)
    assert(got(2)._2("v").status == "NOT_FOUND")
  }

  test("point reader prunes row groups by key statistics on sorted buckets") {
    import spark.implicits._
    // force many tiny row groups so pruning is observable
    val hconf = spark.sparkContext.hadoopConfiguration
    val old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 16 * 1024)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graftrg").toString + "/t"
      (0L until 50000L).map(k => (k, s"payload_$k"))
        .toDF("k", "v").coalesce(1).sortWithinPartitions("k")
        .write.parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => new org.apache.hadoop.fs.Path(f.getAbsolutePath)).toSeq
      val (all, s0) = graft.online.ParquetPointReader.readFilesCounting(hconf, files, None)
      assert(all.length == 50000 && s0 == 0)
      val wanted = Seq(5L, 49999L)
      val (pruned, skipped) = graft.online.ParquetPointReader.readFilesCounting(
        hconf, files, Some("k" -> wanted))
      assert(skipped > 0, "expected some row groups skipped on a sorted multi-group file")
      val got = pruned.filter(m => wanted.contains(m("k"))).map(m => m("k") -> m("v")).toMap
      assert(got == Map(5L -> "payload_5", 49999L -> "payload_49999"))
    } finally {
      if (old == null) hconf.unset("parquet.block.size") else hconf.set("parquet.block.size", old)
    }
  }

  test("serving block cache: local mutations invalidate; a foreign rewrite is caught by (length, mtime)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftbc").toString
    val store = new ParquetOnlineStore(base, numBuckets = 2)
    val view = FeatureView("cv", Seq("e"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(
        Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "et", "v"), "et"))
    def read(k: Long): Any = store.read("p", view, Seq("k"),
      Seq(Seq("k" -> k)), Seq("v"))(0)._2("v").value
    store.upsert("p", view, Seq("k"),
      Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "et", "v"), "et", None)
    assert(read(1L) == 1.0)
    assert(read(1L) == 1.0) // cached path
    // the cache must actually HOLD this table's files under a key the
    // invalidation prefix matches: listStatus returns scheme-qualified
    // paths (file:/...) while the prefix is the raw basePath — a
    // raw-vs-qualified mismatch turns every invalidation into a silent
    // no-op that only new file names were papering over
    val tablePrefix = new org.apache.hadoop.fs.Path(s"$base/p/cv").toUri.getPath
    def cachedUnderTable(): Set[String] =
      graft.online.ParquetOnlineStore.cachedPaths().filter(k =>
        new org.apache.hadoop.fs.Path(k).toUri.getPath.startsWith(tablePrefix))
    assert(cachedUnderTable().nonEmpty,
      s"expected cached entries under $tablePrefix, got ${graft.online.ParquetOnlineStore.cachedPaths()}")
    // local upsert invalidates: the read must see the new value, and
    // the stale entries must be GONE from the cache (not merely
    // shadowed by fresh file names)
    store.upsert("p", view, Seq("k"),
      Seq((1L, ts("2024-01-01 11:00:00"), 2.0)).toDF("k", "et", "v"), "et", None)
    assert(cachedUnderTable().isEmpty,
      "upsert must invalidate every cached entry under its table prefix")
    assert(read(1L) == 2.0)
    // FOREIGN rewrite (another process): replace the bucket file bytes
    // directly on disk — no in-JVM invalidation fires, so only the
    // (length, mtime) check can catch it
    read(1L) // ensure cached
    val dirF = new java.io.File(s"$base/p/cv")
    val bucketFiles = dirF.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(bucketFiles.nonEmpty)
    // write a DIFFERENT store elsewhere with the same schema/key and
    // copy its bucket file bytes over ours
    val alt = java.nio.file.Files.createTempDirectory("graftbc2").toString
    val store2 = new ParquetOnlineStore(alt, numBuckets = 2)
    store2.upsert("p", view, Seq("k"),
      Seq((1L, ts("2024-01-01 12:00:00"), 7.0)).toDF("k", "et", "v"), "et", None)
    val altFiles = new java.io.File(s"$alt/p/cv").listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    // pair by BUCKET DIR, not listFiles() order (unspecified): the same
    // key + same bucket count lands in the same bucket=N dir in both
    // stores, and a mispaired/empty zip would copy nothing and let the
    // final assert fail confusingly (or vacuously pass)
    val altByBucket = altFiles.groupBy(_.getParentFile.getName)
    val pairs = bucketFiles.flatMap(dst =>
      altByBucket.getOrElse(dst.getParentFile.getName, Array.empty[java.io.File])
        .headOption.map(dst -> _))
    assert(pairs.nonEmpty && pairs.size == bucketFiles.size,
      s"every live bucket file needs a foreign twin to overwrite it: " +
        s"live=${bucketFiles.map(_.getParentFile.getName).toSeq} " +
        s"alt=${altFiles.map(_.getParentFile.getName).toSeq}")
    pairs.foreach { case (dst, src) =>
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // force a visible mtime change even on coarse-granularity clocks
      dst.setLastModified(dst.lastModified() + 2000)
      // drop the stale .crc so the checksum fs accepts the new bytes
      val crc = new java.io.File(dst.getParentFile, s".${dst.getName}.crc")
      if (crc.exists()) crc.delete()
    }
    assert(read(1L) == 7.0, "a foreign bucket rewrite must be re-decoded, not served stale")
  }

  test("store recovers from a crashed swap; bucket count persisted and adopted; int-typed keys route correctly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftrec").toString
    // SOURCE column physically Int for an Int64 entity: materialize must
    // cast keys so write-side bucketing matches coerced reads
    val df = Seq((1, ts("2024-01-01 10:00:00"), 0.5), (2, ts("2024-01-01 11:00:00"), 0.7))
      .toDF("driver_id", "et", "v") // driver_id: IntegerType
    val fs = new FeatureStore("rec", new Registry(),
      new ParquetOnlineStore(base, numBuckets = 8), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("rv", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("rv"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    val resp = fs.getOnlineFeatures(Seq("rv:v"), Seq(Map[String, Any]("driver_id" -> 1L)))
    assert(resp.toMap("rv:v") == Seq(0.5),
      "Int source column for Int64 entity must still route reads to the right bucket")

    // simulate a crash after rename-aside, before rename-in: live dir
    // missing, .old holds the data. Reads are mutation-free (ADVICE r2 —
    // a read racing a live swap must not "recover" it): they serve from
    // the .old fallback and leave the layout untouched; the next WRITE
    // heals it.
    val p = new java.io.File(s"$base/rec/rv")
    assert(p.renameTo(new java.io.File(s"$base/rec/rv.old")))
    val resp2 = fs.getOnlineFeatures(Seq("rv:v"), Seq(Map[String, Any]("driver_id" -> 2L)))
    assert(resp2.toMap("rv:v") == Seq(0.7), "read must serve from the rename-aside fallback")
    assert(!p.exists, "a read must never mutate the store layout")
    fs.materialize(Seq("rv"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    assert(p.exists, "the next upsert must run crash recovery and restore the live dir")
    assert(!new java.io.File(s"$base/rec/rv.old").exists,
      "recovery must clear the rename-aside leftovers")
    val respHealed = fs.getOnlineFeatures(Seq("rv:v"), Seq(Map[String, Any]("driver_id" -> 2L)))
    assert(respHealed.toMap("rv:v") == Seq(0.7), "healed store must serve from the live tree")

    // reopen the same path with a DIFFERENT configured bucket count:
    // the persisted marker must win (no misrouted reads)
    val reopened = new FeatureStore("rec", fs.registry,
      new ParquetOnlineStore(base, numBuckets = 32), spark)
    val resp3 = reopened.getOnlineFeatures(Seq("rv:v"),
      Seq(Map[String, Any]("driver_id" -> 1L), Map[String, Any]("driver_id" -> 2L)))
    assert(resp3.toMap("rv:v") == Seq(0.5, 0.7),
      "persisted bucket count must override the configured one")

    // teardown must clear crash leftovers too (review r3): a surviving
    // .old tree would resurrect torn-down rows through the read fallback
    // and its stale marker would override the next store's bucket count
    assert(p.renameTo(new java.io.File(s"$base/rec/rv.old")))
    reopened.onlineStore.teardown("rec", Seq(fs.registry.getFeatureView("rv")))
    assert(!p.exists && !new java.io.File(s"$base/rec/rv.old").exists,
      "teardown must delete the live tree AND .old/.tmp leftovers")
    val respGone = reopened.getOnlineFeatures(Seq("rv:v"),
      Seq(Map[String, Any]("driver_id" -> 2L)))
    assert(respGone.statuses("rv:v") == Seq("NOT_FOUND"),
      "torn-down data must not be readable through the .old fallback")
  }

  test("O16: online entity-row values are coerced to the registered dtype or rejected") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1.5)).toDF("driver_id", "et", "v")
    val fs = new FeatureStore("t3", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("v16", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("v16"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))

    // Int for an Int64 entity: coerced, must HIT (was a spurious NOT_FOUND)
    val okInt = fs.getOnlineFeatures(Seq("v16:v"), Seq(Map[String, Any]("driver_id" -> 1)))
    assert(okInt.toMap("v16:v").head == 1.5)
    // wrong type -> error, not NOT_FOUND
    val e1 = intercept[IllegalArgumentException](
      fs.getOnlineFeatures(Seq("v16:v"), Seq(Map[String, Any]("driver_id" -> "1"))))
    assert(e1.getMessage.contains("expects INT64"))
    // null key -> error
    intercept[IllegalArgumentException](
      fs.getOnlineFeatures(Seq("v16:v"), Seq(Map[String, Any]("driver_id" -> null))))
    // unknown feature ref -> error naming the view's surface (both paths)
    val e3 = intercept[IllegalArgumentException](
      fs.getOnlineFeatures(Seq("v16:nope"), Seq(Map[String, Any]("driver_id" -> 1L))))
    assert(e3.getMessage.contains("has no feature(s) nope"))
    intercept[IllegalArgumentException] {
      fs.getHistoricalFeatures(
        Seq((1L, ts("2024-01-02 00:00:00"))).toDF("driver_id", "event_timestamp"),
        Seq("v16:nope"))
    }
    // duplicate join keys across a view's entities -> error
    fs.applyEntity(Entity("driver2", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("vdup", Seq("driver", "driver2"),
      Seq(Feature("v", GraftType.Dbl)), Duration.ZERO, DataFrameSource(df, "et")))
    val e2 = intercept[IllegalArgumentException](
      fs.getOnlineFeatures(Seq("vdup:v"), Seq(Map[String, Any]("driver_id" -> 1L))))
    assert(e2.getMessage.contains("duplicate join keys"))
    fs.teardown()
  }

  test("apply runs inference: unknown entity dtype + empty feature list + entity-df ts column") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 0.5, "a"),
                 (1L, ts("2024-01-02 10:00:00"), 0.7, "b"))
      .toDF("driver_id", "et", "conv_rate", "tag")
      .withColumn("__internal", lit(1))
    val fs = new FeatureStore("t4", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Unknown, Some("driver_id")))
    fs.applyFeatureView(FeatureView("inf", Seq("driver"), features = Nil,
      Duration.ZERO, DataFrameSource(df, "et")))
    // entity dtype inferred from source join-key column
    assert(fs.registry.getEntity("driver").dtype == GraftType.Int64)
    // features inferred = all minus keys/ts/__internal
    assert(fs.registry.getFeatureView("inf").featureNames.toSet == Set("conv_rate", "tag"))
    // entity-df ts column inferred (single timestamp col, non-default name)
    val entity = Seq((1L, ts("2024-01-03 00:00:00"))).toDF("driver_id", "as_of")
    val hist = fs.getHistoricalFeatures(entity, Seq("inf:conv_rate")).collect()
    assert(hist.length == 1 && hist(0).getAs[Double]("conv_rate") == 0.7)
    fs.teardown()
  }

  test("date-partitioned scan carries PartitionFilters (directory pruning), results unchanged") {
    import spark.implicits._
    val rows = (0 until 100).map { i =>
      (i.toLong % 10, new Timestamp(ts("2024-01-01 00:00:00").getTime + i * 6L * 3600_000L), i.toDouble)
    }
    val df = rows.toDF("k", "et", "v")
    val path = java.nio.file.Files.createTempDirectory("graftdp").toString + "/t"
    graft.sources.DatePartition.write(df, path, "et", "event_date")

    val (start, end) = (ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"))
    val pruned = graft.sources.DatePartition.prune(
      spark.read.parquet(path), Some("event_date"), Some(start), Some(end))
      .filter(col("et") >= start && col("et") <= end)

    val plan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan).map(_.group(1))
    assert(pf.exists(_.contains("event_date")),
      s"expected a non-empty PartitionFilters on event_date, plan:\n$plan")

    val expected = rows.filter { case (_, et, _) =>
      !et.before(start) && !et.after(end) }.map(_._3).toSet
    assert(pruned.collect().map(_.getAs[Double]("v")).toSet == expected)
  }

  test("ingest writes a view's FileSource date-partitioned; retrieval round-trips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftingest").toString
    val fs = new FeatureStore("ing", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    // the TS column is mapped too (src_ts -> et): ingest must derive
    // the date partition from the SOURCE-named column after the
    // reverse rename (review r6 — the feature name failed to resolve)
    fs.applyFeatureView(FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl)), Duration.ZERO,
      FileSource(s"$dir/stats", eventTimestampColumn = "et",
        fieldMapping = Map("drv" -> "driver_id", "src_ts" -> "et"),
        datePartitionColumn = Some("event_date"))))

    // df carries FEATURE names (driver_id, et); ingest reverse-maps to
    // the source columns (drv, src_ts) and derives the date partition
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), 0.4),
      (1L, ts("2024-03-02 10:00:00"), 0.6),
      (2L, ts("2024-03-02 12:00:00"), 0.9))
      .toDF("driver_id", "et", "conv_rate")
    fs.ingest("stats", df)

    val dirs = new java.io.File(s"$dir/stats").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("event_date=2024-03-01", "event_date=2024-03-02"))
    // source stores the reverse-mapped column names
    val storedCols = spark.read.parquet(s"$dir/stats").columns
    assert(storedCols.contains("drv") && storedCols.contains("src_ts"))

    // forward path reads it back through the same source abstraction
    val entity = Seq((1L, ts("2024-03-03 00:00:00")), (2L, ts("2024-03-03 00:00:00")))
      .toDF("driver_id", "event_timestamp")
    val hist = fs.getHistoricalFeatures(entity, Seq("stats:conv_rate"))
      .orderBy("driver_id").collect()
    assert(hist(0).getAs[Double]("conv_rate") == 0.6)
    assert(hist(1).getAs[Double]("conv_rate") == 0.9)

    // appending another day only adds a directory
    fs.ingest("stats", Seq((2L, ts("2024-03-04 10:00:00"), 1.0))
      .toDF("driver_id", "et", "conv_rate"))
    val dirs2 = new java.io.File(s"$dir/stats").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs2.length == 3)
  }

  test("JdbcOnlineStore: out-of-order replay LWW in SQL, arrays via ValueCodec, missing table") {
    import spark.implicits._
    val store = new graft.online.JdbcOnlineStore(graft.online.JdbcOnlineStore.derbyUrl(
      java.nio.file.Files.createTempDirectory("graftjd").toString + "/db"))
    val fs = new FeatureStore("jd", new Registry(), store, spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    val mkDf = (rows: Seq[(Long, Timestamp, Double, Seq[Double])]) =>
      rows.toDF("driver_id", "et", "rate", "emb")
    val newer = mkDf(Seq((1L, ts("2024-01-02 10:00:00"), 0.9, Seq(9.0, 9.5))))
    val older = mkDf(Seq(
      (1L, ts("2024-01-01 10:00:00"), 0.1, Seq(1.0, 1.5)), // stale: must lose
      (2L, ts("2024-01-01 09:00:00"), 0.2, Seq(2.0, 2.5))))
    val view = FeatureView("jv", Seq("driver"),
      Seq(Feature("rate", GraftType.Dbl), Feature("emb", GraftType.ListOf(GraftType.Dbl))),
      Duration.ZERO, DataFrameSource(newer, "et"))
    fs.applyFeatureView(view)

    // read before any materialize: table absent -> clean NOT_FOUND
    val empty = fs.getOnlineFeatures(Seq("jv:rate"), Seq(Map[String, Any]("driver_id" -> 1L)))
    assert(empty.statuses("jv:rate") == Seq("NOT_FOUND"))

    // replay arrives NEWEST FIRST: the second (older) upsert must not
    // clobber driver 1 — the LWW predicate lives in the SQL UPDATE
    val v = fs.registry.getFeatureView("jv")
    store.upsert("jd", v, Seq("driver_id"), newer, "et", None)
    store.upsert("jd", v, Seq("driver_id"), older, "et", None)
    val resp = fs.getOnlineFeatures(Seq("jv:rate", "jv:emb"),
      Seq(1L, 2L).map(id => Map[String, Any]("driver_id" -> id)))
    assert(resp.toMap("jv:rate") == Seq(0.9, 0.2), "stale replay must lose LWW")
    assert(resp.toMap("jv:emb")(0).asInstanceOf[Seq[Any]] == Seq(9.0, 9.5),
      "array feature must round-trip through the BLOB codec")

    store.teardown("jd", Seq(v))
    val gone = fs.getOnlineFeatures(Seq("jv:rate"), Seq(Map[String, Any]("driver_id" -> 1L)))
    assert(gone.statuses("jv:rate") == Seq("NOT_FOUND"))
  }

  test("JdbcOnlineStore table names are collision-free and identifier-length-safe") {
    import graft.online.JdbcOnlineStore.tableNameFor
    // sanitize-and-concat would map all of these to the same identifier
    val names = Seq(
      tableNameFor("graft", "ci_stats"), tableNameFor("graft_ci", "stats"),
      tableNameFor("graft", "ci.stats"), tableNameFor("graft", "ci-stats"),
      tableNameFor("graft.ci", "stats"))
    assert(names.distinct.size == names.size, s"colliding table names: $names")
    // Derby caps identifiers at 128 chars; long names must stay under it
    val long = tableNameFor("p" * 120, "v" * 120)
    assert(long.length <= 128)
    // and two distinct long pairs sharing a 100-char prefix still differ
    assert(long != tableNameFor("p" * 120, "v" * 119 + "x"))
    // stability: the same pair always maps to the same table
    assert(tableNameFor("graft", "ci_stats") == tableNameFor("graft", "ci_stats"))
  }

  test("composite-key view (two entities) and array features round-trip offline + online") {
    import spark.implicits._
    val rows = Seq(
      (1L, "us", ts("2024-01-01 10:00:00"), 0.1, Seq(1.0, 2.0)),
      (1L, "us", ts("2024-01-02 10:00:00"), 0.2, Seq(3.0, 4.0)),
      (1L, "eu", ts("2024-01-02 11:00:00"), 0.3, Seq(5.0, 6.0)),
      (2L, "eu", ts("2024-01-01 09:00:00"), 0.4, Seq(7.0, 8.0)))
    val df = rows.toDF("driver_id", "region", "et", "rate", "emb")
    val store = new ParquetOnlineStore(
      java.nio.file.Files.createTempDirectory("graftck").toString, numBuckets = 4)
    val fs = new FeatureStore("ck", new Registry(), store, spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyEntity(Entity("region", GraftType.Str, Some("region")))
    fs.applyFeatureView(FeatureView("cv", Seq("driver", "region"),
      Seq(Feature("rate", GraftType.Dbl), Feature("emb", GraftType.ListOf(GraftType.Dbl))),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("cv"), ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))

    // online: composite keys resolve independently; array feature
    // survives the parquet store and the job-free point reader
    val resp = fs.getOnlineFeatures(Seq("cv:rate", "cv:emb"), Seq(
      Map[String, Any]("driver_id" -> 1L, "region" -> "us"),
      Map[String, Any]("driver_id" -> 1L, "region" -> "eu"),
      Map[String, Any]("driver_id" -> 2L, "region" -> "us"))) // absent combo
    assert(resp.toMap("cv:rate") == Seq(0.2, 0.3, null))
    assert(resp.toMap("cv:emb")(0).asInstanceOf[Seq[Double]] == Seq(3.0, 4.0))
    assert(resp.statuses("cv:rate")(2) == "NOT_FOUND")
    // missing one of the two keys -> error, not a silent miss
    intercept[IllegalArgumentException] {
      fs.getOnlineFeatures(Seq("cv:rate"), Seq(Map[String, Any]("driver_id" -> 1L)))
    }

    // offline PIT join on the composite key agrees
    val entity = Seq((1L, "us", ts("2024-01-03 00:00:00")), (1L, "eu", ts("2024-01-01 12:00:00")))
      .toDF("driver_id", "region", "event_timestamp")
    val hist = fs.getHistoricalFeatures(entity, Seq("cv:rate"))
      .orderBy("region").collect()
    assert(hist.map(_.getAs[Any]("rate")).toSeq == Seq(null, 0.2)) // eu@01-01: no row yet
    fs.teardown()
  }

  test("FeatureService: projections drive both historical and online retrieval") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 0.5, "a", 7L))
      .toDF("driver_id", "et", "rate", "tag", "extra")
    val fs = new FeatureStore("svc", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("dv", Seq("driver"),
      Seq(Feature("rate", GraftType.Dbl), Feature("tag", GraftType.Str),
        Feature("extra", GraftType.Int64)),
      Duration.ZERO, DataFrameSource(df, "et")))
    // service projects a SUBSET of the view's features
    fs.applyFeatureService(FeatureService("serving_v1",
      Seq(fs.registry.getFeatureView("dv").select(Seq("rate", "tag")))))
    fs.materialize(Seq("dv"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))

    val svc = fs.registry.getFeatureService("serving_v1")
    val hist = fs.getHistoricalFeatures(
      Seq((1L, ts("2024-01-02 00:00:00"))).toDF("driver_id", "event_timestamp"), svc)
    assert(hist.columns.toSet == Set("driver_id", "event_timestamp", "rate", "tag"),
      "service projection must select only its features")
    val online = fs.getOnlineFeatures(svc, Seq(Map[String, Any]("driver_id" -> 1L)))
    assert(online.toMap == Map("dv:rate" -> Seq(0.5), "dv:tag" -> Seq("a")))
    // projecting a feature the view lacks is rejected at service build time
    intercept[IllegalArgumentException](
      fs.registry.getFeatureView("dv").select(Seq("nope")))
    fs.teardown()
  }

  test("materialize honors last-write-wins on overlapping windows") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-05 10:00:00"), 5.0)).toDF("driver_id", "et", "v")
    val fs = new FeatureStore("t2", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("v", Seq("driver"), Seq(Feature("v", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, "et")))
    // materialize the LATER window first; replaying the earlier window
    // must not regress the stored value
    fs.materialize(Seq("v"), ts("2024-01-04 00:00:00"), ts("2024-01-06 00:00:00"))
    fs.materialize(Seq("v"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    val resp = fs.getOnlineFeatures(Seq("v:v"), Seq(Map[String, Any]("driver_id" -> 1L)))
    assert(resp.toMap("v:v").head == 5.0)
    fs.teardown()
  }

  test("IntervalJoin.binned: [start,end) semantics, multi-bin intervals, no duplicate pairs") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    val probe = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start of w1: included
      (2L, ts("2024-01-01 02:00:00")), // == end of w1: EXCLUDED; == start of w2
      (3L, ts("2024-01-01 01:59:59")), // inside w1, last second
      (4L, ts("2024-01-01 07:30:00")), // inside the 6h window w3 only
      (5L, ts("2024-01-02 00:00:00"))  // outside everything
    ).toDF("id", "ts")
    val intervals = Seq(
      ("w1", ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      ("w2", ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00")),
      // 6h window spanning many 1h bins: events must match once, not per bin
      ("w3", ts("2024-01-01 04:00:00"), ts("2024-01-01 10:00:00")),
      // empty and inverted intervals are dropped
      ("wE", ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00")),
      ("wI", ts("2024-01-01 06:00:00"), ts("2024-01-01 05:00:00"))
    ).toDF("w", "ws", "we")
    val got = IntervalJoin.binned(probe, "ts", intervals, "ws", "we", binWidthSec = 3600)
      .select("id", "w").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "w1"), (3L, "w1"), (2L, "w2"), (4L, "w3")))
    // overlapping intervals: a probe row matches each containing window once
    val overlap = Seq(
      ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")),
      ("b", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:30:00"))).toDF("w", "ws", "we")
    val got2 = IntervalJoin.binned(probe.filter(col("id") === 3L), "ts",
        overlap, "ws", "we", binWidthSec = 3600)
      .select("id", "w").as[(Long, String)].collect().toSet
    assert(got2 == Set((3L, "a"), (3L, "b")))
    // equiKeys narrow matches to the same key
    val kp = Seq((1L, "u1", ts("2024-01-01 00:30:00")),
      (2L, "u2", ts("2024-01-01 00:30:00"))).toDF("id", "u", "ts")
    val ki = Seq(("k1", "u1", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("w", "iu", "ws", "we")
    val got3 = IntervalJoin.binned(kp, "ts", ki, "ws", "we", 3600, Seq("u" -> "iu"))
      .select("id", "w").as[(Long, String)].collect().toSet
    assert(got3 == Set((1L, "k1")))
    // a runaway interval (unit slip / year-9999 end) fails LOUDLY naming
    // its bounds instead of exploding sequence() into an executor OOM
    val runaway = Seq(("bad", ts("2024-01-01 00:00:00"), ts("9999-01-01 00:00:00")))
      .toDF("w", "ws", "we")
    val e = intercept[Exception] {
      IntervalJoin.binned(probe, "ts", runaway, "ws", "we", 3600,
          maxBinsPerInterval = 1000)
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("more than 1000 bins")),
      s"expected the bin-cap error, got ${msgs(e)}")
  }

  test("EntityBucketExpr matches driver-side EntityKeyCodec routing on random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // mixed-type composite key (string + long), names deliberately NOT
    // pre-sorted — the expression must sort to the canonical order
    val rows = (0 until 500).map { i =>
      (rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString, rnd.nextLong(), i)
    }
    val df = rows.toDF("zone", "user_id", "idx")
    for (buckets <- Seq(1, 8, 32)) {
      val got = df.withColumn("b",
          graft.online.EntityBucketExpr.bucketId(Seq("user_id", "zone"), buckets))
        .select("idx", "b").as[(Int, Int)].collect().toMap
      rows.foreach { case (z, u, i) =>
        val want = (graft.online.EntityKeyCodec.hashKey(
          Seq("zone" -> z, "user_id" -> u)) % buckets).toInt
        assert(got(i) == want, s"bucket mismatch for ($z, $u) at buckets=$buckets")
      }
    }
  }

  test("ParquetOnlineStore: an empty FIRST upsert creates no table; later upserts still work") {
    import spark.implicits._
    import graft.model._
    val path = s"/tmp/graft_empty_first_${java.util.UUID.randomUUID().toString.take(8)}"
    val store = new graft.online.ParquetOnlineStore(path, numBuckets = 4)
    val view = FeatureView("v", Seq("user"),
      Seq(Feature("value", GraftType.Dbl)), java.time.Duration.ZERO,
      DataFrameSource(spark.emptyDataFrame, eventTimestampColumn = "ts"))
    val empty = Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "ts", "value")
    // an empty stream batch 0 must NOT create a data-less parquet dir
    // (it would poison every later read with 'Unable to infer schema')
    store.upsert("p", view, Seq("user_id"), empty, "ts", None)
    assert(!new java.io.File(s"$path/p/v").exists(), "empty first upsert must not create the table")
    store.upsert("p", view, Seq("user_id"),
      Seq((1L, ts("2024-01-01 00:00:00"), 0.5)).toDF("user_id", "ts", "value"), "ts", None)
    val got = store.read("p", view, Seq("user_id"),
      Seq(Seq("user_id" -> 1L)), Seq("value"))
    assert(got.head._2("value").value === 0.5)
    // and an empty LATER upsert over an existing table is a no-op merge
    store.upsert("p", view, Seq("user_id"), empty, "ts", None)
    assert(store.read("p", view, Seq("user_id"),
      Seq(Seq("user_id" -> 1L)), Seq("value")).head._2("value").value === 0.5)
  }

  test("StagedWrite: append/overwrite semantics, crash-leftover healing, staging sweep") {
    import spark.implicits._
    val dest = s"/tmp/graft_staged_${java.util.UUID.randomUUID().toString.take(8)}"
    def read() = spark.read.parquet(dest).as[(Long, String)].collect().toSet
    def listSiblings(): Seq[String] = {
      val p = new java.io.File(dest).getParentFile
      p.listFiles().map(_.getName).filter(_.startsWith(new java.io.File(dest).getName)).toSeq
    }

    graft.sources.StagedWrite.parquet(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dest, "append")
    assert(read() === Set((1L, "a"), (2L, "b")))
    graft.sources.StagedWrite.parquet(Seq((3L, "c")).toDF("k", "v"), dest, "append")
    assert(read() === Set((1L, "a"), (2L, "b"), (3L, "c")), "append must preserve old rows")
    graft.sources.StagedWrite.parquet(Seq((9L, "z")).toDF("k", "v"), dest, "overwrite")
    assert(read() === Set((9L, "z")), "overwrite must replace")
    assert(listSiblings() === Seq(new java.io.File(dest).getName),
      s"no staging/.old leftovers after clean writes: ${listSiblings()}")

    // crash leftovers: a stale staging dir is swept; a .old tree with
    // the dest missing (overwrite died between the two renames) heals
    // back to the old copy before the new write applies
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((7L, "stale")).toDF("k", "v").write.parquet(dest + ".stage-dead")
    // backdate the WHOLE tree past the staleness gate (the sweep keys
    // off the newest tree mtime, so a single fresh leaf keeps a dir
    // alive): the sweep is age-gated so a LIVE concurrent writer's
    // staging dir is never deleted mid-write
    def backdate(f: java.io.File): Unit = {
      fs.setTimes(new org.apache.hadoop.fs.Path(f.toString),
        System.currentTimeMillis() - graft.sources.StagedWrite.stageStaleMs - 60000L, -1L)
      Option(f.listFiles()).foreach(_.foreach(backdate))
    }
    backdate(new java.io.File(dest + ".stage-dead"))
    Seq((8L, "live")).toDF("k", "v").write.parquet(dest + ".stage-live")
    fs.rename(new org.apache.hadoop.fs.Path(dest),
      new org.apache.hadoop.fs.Path(dest + ".old"))
    graft.sources.StagedWrite.parquet(Seq((10L, "n")).toDF("k", "v"), dest, "append")
    assert(read() === Set((9L, "z"), (10L, "n")),
      "append after a crashed swap must heal the old copy and append to it")
    val after = listSiblings()
    assert(!after.contains(new java.io.File(dest + ".stage-dead").getName),
      s"stale crash leftovers must be swept: $after")
    assert(after.contains(new java.io.File(dest + ".stage-live").getName),
      s"a fresh staging dir (possible live writer) must survive the sweep: $after")
    fs.delete(new org.apache.hadoop.fs.Path(dest + ".stage-live"), true)
    assert(listSiblings() === Seq(new java.io.File(dest).getName),
      s"no other leftovers: ${listSiblings()}")
  }

  test("sharded store: Spark-side HRW routing is the driver formula's exact twin") {
    import spark.implicits._
    // three-path agreement is the composite's whole correctness story:
    // the write path (rendezvousShard over the EntityKeyHex expression)
    // must land every key on the shard the read path (shardOf over
    // EntityKeyCodec.hexKey) will look in
    val store = new graft.online.ShardedOnlineStore(IndexedSeq.fill(5)(new InMemoryOnlineStore()))
    val keys = (0L until 500L) ++ Seq(Long.MaxValue, Long.MinValue, -1L)
    val sparkSide = keys.toDF("driver_id")
      .withColumn("s", store.shardCol(Seq("driver_id")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      val d = store.shardOf(Seq("driver_id" -> k))
      assert(sparkSide(k) == d, s"key $k: spark=${sparkSide(k)} driver=$d")
    }
    // all shards actually used (md5 uniformity at 500 keys)
    assert(sparkSide.values.toSet.size == 5)
  }

  test("sharded store grow 3→4: only new-shard-bound keys move; rebalance serves everything") {
    import spark.implicits._
    // VERDICT r13 #6 end-to-end: the unit-pinned HRW property (grow
    // moves ~1/(n+1) of keys, every one TO the new shard) through real
    // parquet children — moved-key SET membership pinned, rebalance
    // moves exactly that set, and the grown composite serves all keys.
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftgrow").toString)
    val old3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val view = FeatureView("gv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 200L).toIndexedSeq
    old3.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 1.5))
        .toDF("driver_id", "et", "v1"), "et", None)

    val grown = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)) :+
        new ParquetOnlineStore(dirs(3), numBuckets = 2))
    val movedKeys = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) != old3.shardOf(Seq("driver_id" -> k)))
    // membership: EVERY moved key moves TO the new shard — no lateral
    // movement between surviving shards (the HRW guarantee)
    movedKeys.foreach { k =>
      assert(grown.shardOf(Seq("driver_id" -> k)) == 3,
        s"key $k moved laterally, not to the new shard")
    }
    // expected ~1/4 of 200 = 50; generous deterministic bounds
    assert(movedKeys.size > 20 && movedKeys.size < 85,
      s"moved ${movedKeys.size}/200 — outside the ~1/(n+1) neighborhood")

    // BEFORE rebalance: the new shard has nothing yet (direct child
    // probe pins where rows physically are) …
    val onNewBefore = grown.children(3).read("p", view, Seq("driver_id"),
      movedKeys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(onNewBefore.forall(_._2("v1").status == "NOT_FOUND"),
      "moved rows must not be on the new shard before rebalance")
    // … yet the COMPOSITE serves every key: the old shards' ring
    // markers still record size 3 < 4, which arms the grow-window
    // fallback (a miss on the LAST shard re-probes the key's home
    // under the first n-1 shards) — serving never misses during a
    // grow (r15, VERDICT r14 #3)
    val before = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(grown.growPending, "grow-awaiting-rebalance must be detected from the markers")
    keys.zip(before).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 1.5,
        s"key $k must serve through the grow fallback before rebalance: ${m("v1")}")
    }

    val moved = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(moved == movedKeys.size,
      s"rebalance moved $moved rows, expected ${movedKeys.size}")
    grown.commitRingMarkers()
    assert(!grown.growPending, "commit must disarm the grow fallback")
    val after = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    keys.zip(after).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 1.5, s"key $k after rebalance: ${m("v1")}")
    }
    // the moved rows really live on the NEW shard (and only there —
    // direct child probes, not composite routing)
    val onNew = grown.children(3).read("p", view, Seq("driver_id"),
      movedKeys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(onNew.forall(_._2("v1").status == "PRESENT"))
    movedKeys.take(10).foreach { k =>
      val src = old3.shardOf(Seq("driver_id" -> k))
      val gone = grown.children(src).read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> k)), Seq("v1"))
      assert(gone.head._2("v1").status == "NOT_FOUND",
        s"rebalance must delete moved key $k from its source shard $src")
    }
    // the committed markers now record ring size 4 — a FRESH store
    // opened with the old 3-ring against these dirs is the misroute
    // the ADVICE r14 marker exists to catch: it must fail LOUDLY
    // (shrink unsupported), never silently serve the pre-grow routing
    // (old3 itself validated its ring once at upsert time, before the
    // grow — the guard is per-open, like numBuckets adoption)
    val stale3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val shrunk = intercept[IllegalArgumentException] {
      stale3.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> keys.head)), Seq("v1"))
    }
    assert(shrunk.getMessage.contains("shrink"), shrunk.getMessage)
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("sharded store: TTL expire fans out to every shard (the sweep that bounds the store)") {
    import spark.implicits._
    // review r14: without the fan-out a sharded_parquet deployment
    // could never expire — rows accumulated forever in every shard
    val dirs = IndexedSeq.fill(3)(
      java.nio.file.Files.createTempDirectory("graftshexp").toString)
    val store = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val view = FeatureView("ev", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ofDays(1), DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val rows = (0L until 40L).map(k =>
      (k, if (k % 2 == 0) ts("2020-01-01 00:00:00") else ts("2024-02-01 10:00:00"), k * 1.0))
    store.upsert("p", view, Seq("driver_id"), rows.toDF("driver_id", "et", "v1"), "et", None)
    val n = store.expire(spark, "p", view, Seq("driver_id"), "et",
      ts("2021-01-01 00:00:00"))
    assert(n == 20, s"expire must remove the 20 pre-cutoff rows across shards, got $n")
    val got = store.read("p", view, Seq("driver_id"),
      (0L until 40L).map(k => Seq("driver_id" -> k)), Seq("v1"))
    (0L until 40L).zip(got).foreach { case (k, (_, m)) =>
      val want = if (k % 2 == 0) "NOT_FOUND" else "PRESENT"
      assert(m("v1").status == want, s"key $k: ${m("v1").status} != $want")
    }
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("sharded ring markers: a reordered paths list fails loudly instead of misrouting") {
    import spark.implicits._
    // ADVICE r14: the ring is positional config with (previously) no
    // persisted guard — swapping two entries silently routed every key
    // to the wrong shard (NOT_FOUND / stale serves). The per-shard
    // marker written at first mutating use must catch the reorder on
    // open, same discipline as the parquet store's bucket-count marker.
    val dirs = IndexedSeq.fill(3)(
      java.nio.file.Files.createTempDirectory("graftring").toString)
    val view = FeatureView("rv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val store = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    store.upsert("p", view, Seq("driver_id"),
      (0L until 30L).map(k => (k, ts("2024-02-01 10:00:00"), k * 1.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    // same dirs, entries 0 and 2 swapped — both reads and writes must
    // refuse before any row is routed
    val reordered = new graft.online.ShardedOnlineStore(
      IndexedSeq(dirs(2), dirs(1), dirs(0)).map(d =>
        new ParquetOnlineStore(d, numBuckets = 2)))
    val eRead = intercept[IllegalArgumentException] {
      reordered.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eRead.getMessage.contains("POSITIONAL"), eRead.getMessage)
    val eWrite = intercept[IllegalArgumentException] {
      reordered.upsert("p", view, Seq("driver_id"),
        Seq((1L, ts("2024-02-02 10:00:00"), 9.0))
          .toDF("driver_id", "et", "v1"), "et", None)
    }
    assert(eWrite.getMessage.contains("POSITIONAL"), eWrite.getMessage)
    // a FOREIGN salt is the same class of misroute
    val salted = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)), salt = "other")
    val eSalt = intercept[IllegalArgumentException] {
      salted.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eSalt.getMessage.contains("salt"), eSalt.getMessage)
    // the CORRECT ring (a fresh instance over the same dirs) still opens
    val again = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val ok = again.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    assert(ok.head._2("v1").value == 1.0)
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("parallel rebalance: concurrent per-shard movers converge to the sequential result (r16)") {
    import spark.implicits._
    // The serve-during-grow window is Σ(shards) under the sequential
    // child loop; --parallel runs the per-shard move tasks on driver
    // threads (cross-shard upserts already serialize on the children's
    // writer leases). Grow 2→4 so TWO targets receive from TWO sources
    // concurrently; the result must be exactly the sequential
    // contract: moved == |HRW-changed keys|, every key serves from its
    // grown home, and a re-run is a converged no-op.
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftpar").toString)
    val view = FeatureView("prv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val old2 = new graft.online.ShardedOnlineStore(
      dirs.take(2).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val keys = (0L until 150L).toIndexedSeq
    old2.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 3.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val movedKeys = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) != old2.shardOf(Seq("driver_id" -> k)))
    assert(movedKeys.map(k => grown.shardOf(Seq("driver_id" -> k))).toSet
      .subsetOf(Set(2, 3)), "grow 2→4 moves must land on the new shards")
    val moved = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None,
      parallelism = 4)
    assert(moved == movedKeys.size,
      s"parallel rebalance moved $moved, expected ${movedKeys.size}")
    grown.commitRingMarkers()
    val after = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    keys.zip(after).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 3.0,
        s"key $k after parallel rebalance: ${m("v1")}")
    }
    // rows physically landed on their grown homes (direct child probes)
    movedKeys.take(10).foreach { k =>
      val home = grown.shardOf(Seq("driver_id" -> k))
      val here = grown.children(home).read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> k)), Seq("v1"))
      assert(here.head._2("v1").status == "PRESENT", s"key $k not on home $home")
      val src = old2.shardOf(Seq("driver_id" -> k))
      val gone = grown.children(src).read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> k)), Seq("v1"))
      assert(gone.head._2("v1").status == "NOT_FOUND",
        s"key $k still on source $src after parallel rebalance")
    }
    // converged: a second parallel run moves nothing
    val again = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    assert(again.rebalance(spark, "p", view, Seq("driver_id"), "et", None,
      parallelism = 4) == 0L, "second parallel run must be a no-op")
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("grow-pending guard: a live pre-grow process refuses loudly once the grown ring begins mutating (r16)") {
    import spark.implicits._
    // The grow lifecycle's step-1 ("restart every writer and server on
    // the grown config BEFORE rebalance") was a documented-only
    // precondition — a forgotten old-config writer silently wrote
    // pre-grow homes that lose to post-grow readers. The grown ring's
    // first mutating use now persists a grow-pending marker on every
    // shard; the old process must fail its NEXT operation loudly.
    val dirs = IndexedSeq.fill(3)(
      java.nio.file.Files.createTempDirectory("graftpend").toString)
    val view = FeatureView("pv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val old2 = new graft.online.ShardedOnlineStore(
      dirs.take(2).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    old2.upsert("p", view, Seq("driver_id"),
      (0L until 30L).map(k => (k, ts("2024-02-01 10:00:00"), k * 1.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    // the grown deployment comes up and MUTATES — this arms the guard
    val grown = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    grown.upsert("p", view, Seq("driver_id"),
      Seq((100L, ts("2024-02-01 11:00:00"), 100.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    // the still-live OLD writer: next upsert and delete refuse
    val eUp = intercept[IllegalArgumentException] {
      old2.upsert("p", view, Seq("driver_id"),
        Seq((1L, ts("2024-02-01 12:00:00"), 9.0))
          .toDF("driver_id", "et", "v1"), "et", None)
    }
    assert(eUp.getMessage.contains("grown") &&
      eUp.getMessage.contains("restart"), eUp.getMessage)
    val eDel = intercept[IllegalArgumentException] {
      old2.delete("p", view, Seq("driver_id"),
        Seq(Tuple1(1L)).toDF("driver_id"))
    }
    assert(eDel.getMessage.contains("restart"), eDel.getMessage)
    // the still-live OLD server: reads turn loud within one probe TTL
    // (TTL forced to 0 here so the spec doesn't sleep)
    old2.pendingProbeTtlMs = 0L
    val eRead = intercept[IllegalArgumentException] {
      old2.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eRead.getMessage.contains("restart"), eRead.getMessage)
    // a pre-grow config's TEARDOWN would drop the old shards while
    // missing the grown ring's new one — refused too
    val eTear = intercept[IllegalArgumentException] {
      old2.teardown("p", Seq(view))
    }
    assert(eTear.getMessage.contains("restart"), eTear.getMessage)
    // a FRESH pre-grow-config process refuses at open, before routing
    val fresh2 = new graft.online.ShardedOnlineStore(
      dirs.take(2).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val eFresh = intercept[IllegalArgumentException] {
      fresh2.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eFresh.getMessage.contains("restart"), eFresh.getMessage)
    // the GROWN config itself never trips its own guard, completes the
    // lifecycle, and commit DISARMS: a fresh grown instance validates
    // clean and serves; a fresh pre-grow instance now fails on the
    // committed markers (shrink), not the cleared pending
    grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    grown.commitRingMarkers()
    val again = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    val ok = again.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    assert(ok.head._2("v1").value == 1.0)
    assert(again.children.head.asInstanceOf[ParquetOnlineStore]
      .readPendingSize().isEmpty, "commit must clear the pending marker")
    val eShrunk = intercept[IllegalArgumentException] {
      new graft.online.ShardedOnlineStore(
        dirs.take(2).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
        .read("p", view, Seq("driver_id"), Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eShrunk.getMessage.contains("shrink"), eShrunk.getMessage)
    // JDBC twin: the same guard through G_RING_PENDING rows
    val dbs = IndexedSeq.fill(2)(
      java.nio.file.Files.createTempDirectory("graftjpend").toString + "/db")
    def jstore(d: String) = new graft.online.JdbcOnlineStore(
      graft.online.JdbcOnlineStore.derbyUrl(d))
    val jold = new graft.online.ShardedOnlineStore(IndexedSeq(jstore(dbs(0))))
    jold.upsert("p", view, Seq("driver_id"),
      Seq((1L, ts("2024-02-01 10:00:00"), 1.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val jgrown = new graft.online.ShardedOnlineStore(dbs.map(jstore))
    jgrown.upsert("p", view, Seq("driver_id"),
      Seq((2L, ts("2024-02-01 11:00:00"), 2.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val eJdbc = intercept[IllegalArgumentException] {
      jold.upsert("p", view, Seq("driver_id"),
        Seq((1L, ts("2024-02-01 12:00:00"), 9.0))
          .toDF("driver_id", "et", "v1"), "et", None)
    }
    assert(eJdbc.getMessage.contains("restart"), eJdbc.getMessage)
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    dbs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(d).getParentFile))
  }

  test("sharded grow by TWO: the fallback re-routes under the markers' pre-grow size, so every key serves") {
    import spark.implicits._
    // the fallback is generalized past grow-by-one (r15 self-review):
    // a missed key re-probes its winner under the PRE-grow ring size
    // the markers record — keys bound to EITHER new shard find their
    // old home, and unmoved keys' genuine misses stay one probe
    val dirs = IndexedSeq.fill(5)(
      java.nio.file.Files.createTempDirectory("graftgrow2").toString)
    val view = FeatureView("g2", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 200L).toIndexedSeq
    val old3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    old3.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 4.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown5 = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    // keys now bound to BOTH new shards must serve pre-rebalance
    val movedTo = keys.groupBy(k => grown5.shardOf(Seq("driver_id" -> k)))
    assert(movedTo.contains(3) && movedTo.contains(4),
      "200 keys must populate both new shards' routing")
    val got = grown5.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(grown5.growPending && grown5.growSizes == Seq(3))
    keys.zip(got).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 4.0,
        s"key $k must serve through the generalized fallback: ${m("v1")}")
    }
    // rebalance + commit converges and disarms
    val moved = grown5.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(moved == keys.count(k =>
      grown5.shardOf(Seq("driver_id" -> k)) != old3.shardOf(Seq("driver_id" -> k))))
    grown5.commitRingMarkers()
    assert(!grown5.growPending && grown5.growSizes.isEmpty)
    val after = grown5.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(after.forall(_._2("v1").status == "PRESENT"))
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("sharded_jdbc ring: persisted G_RING markers guard the ring; rebalance migrates a grow in stored wire form (VERDICT r15 #1)") {
    import spark.implicits._
    val dbs = IndexedSeq.fill(3)(
      java.nio.file.Files.createTempDirectory("graftjring").toString + "/db")
    def jstore(d: String) = new graft.online.JdbcOnlineStore(
      graft.online.JdbcOnlineStore.derbyUrl(d))
    val view = FeatureView("jv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 80L).toIndexedSeq
    val old2 = new graft.online.ShardedOnlineStore(dbs.take(2).map(jstore))
    old2.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 2.0))
        .toDF("driver_id", "et", "v1"), "et", None)

    // the reordered-ring test parameterized over a JDBC ring (the r15
    // ask): reorder and foreign salt must refuse BEFORE routing a key,
    // exactly like the parquet markers
    val reordered = new graft.online.ShardedOnlineStore(
      IndexedSeq(dbs(1), dbs(0)).map(jstore))
    val eRead = intercept[IllegalArgumentException] {
      reordered.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eRead.getMessage.contains("POSITIONAL"), eRead.getMessage)
    val salted = new graft.online.ShardedOnlineStore(
      dbs.take(2).map(jstore), salt = "other")
    val eSalt = intercept[IllegalArgumentException] {
      salted.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eSalt.getMessage.contains("salt"), eSalt.getMessage)

    // GROW 2→3: the fallback serves every key pre-rebalance, then the
    // JDBC rebalance (keyset pages over (hex, ts, created, payload) —
    // no decode) moves exactly the changed-winner sliver
    val grown = new graft.online.ShardedOnlineStore(dbs.map(jstore))
    val movedKeys = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) != old2.shardOf(Seq("driver_id" -> k)))
    assert(movedKeys.nonEmpty && movedKeys.size < keys.size)
    movedKeys.foreach(k => assert(grown.shardOf(Seq("driver_id" -> k)) == 2,
      s"key $k moved laterally, not to the new shard"))
    val before = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(grown.growPending && grown.growSizes == Seq(2))
    keys.zip(before).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 2.0,
        s"key $k must serve through the JDBC grow fallback: ${m("v1")}")
    }
    val moved = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(moved == movedKeys.size, s"moved $moved != ${movedKeys.size}")
    grown.commitRingMarkers()
    assert(!grown.growPending)
    // moved rows live on the new shard and are GONE from their source
    val onNew = grown.children(2).read("p", view, Seq("driver_id"),
      movedKeys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(onNew.forall(_._2("v1").status == "PRESENT"))
    movedKeys.take(10).foreach { k =>
      val src = old2.shardOf(Seq("driver_id" -> k))
      val gone = grown.children(src).read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> k)), Seq("v1"))
      assert(gone.head._2("v1").status == "NOT_FOUND",
        s"rebalance must delete moved key $k from source shard $src")
    }
    // a second rebalance is a converged no-op; every key still serves
    assert(grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None) == 0L)
    val after = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    keys.zip(after).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 2.0)
    }
    // the committed size-3 markers make a stale 2-ring open a SHRINK —
    // loud, never the silent misroute
    val stale2 = new graft.online.ShardedOnlineStore(dbs.take(2).map(jstore))
    val eShrink = intercept[IllegalArgumentException] {
      stale2.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    }
    assert(eShrink.getMessage.contains("shrink"), eShrink.getMessage)
    // a MIXED ring cannot rebalance (fresh homes: no marker noise)
    val mixed = new graft.online.ShardedOnlineStore(IndexedSeq(
      jstore(java.nio.file.Files.createTempDirectory("graftjmix").toString + "/db"),
      new ParquetOnlineStore(
        java.nio.file.Files.createTempDirectory("graftjmix").toString)))
    val eMixed = intercept[UnsupportedOperationException] {
      mixed.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    }
    assert(eMixed.getMessage.contains("homogeneous"), eMixed.getMessage)
  }

  test("sharded overlapping grows: the fallback probes EVERY marked ring size, so first-window writes survive a second grow (ADVICE r15)") {
    import spark.implicits._
    // the medium ADVICE r15 scenario verbatim: 2→3 with writes in the
    // window, then 3→4 BEFORE the first rebalance. Markers now record
    // {2, 3, 4}; a first-window key living on its ring-3 winner is
    // reachable neither by the ring-4 primary probe nor by a
    // ring-2-only fallback — the multi-size fallback must find it.
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftgrowov").toString)
    def pstore(d: String) = new ParquetOnlineStore(d, numBuckets = 2)
    val view = FeatureView("ov", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    def put(store: graft.online.ShardedOnlineStore, ks: Seq[Long]): Unit =
      store.upsert("p", view, Seq("driver_id"),
        ks.map(k => (k, ts("2024-02-01 10:00:00"), k * 1.0))
          .toDF("driver_id", "et", "v1"), "et", None)
    val aKeys = (0L until 60L).toIndexedSeq    // era A: written on the 2-ring
    val bKeys = (100L until 160L).toIndexedSeq // era B: first grow window (3-ring)
    val cKeys = (200L until 230L).toIndexedSeq // era C: second grow window (4-ring)
    put(new graft.online.ShardedOnlineStore(dirs.take(2).map(pstore)), aKeys)
    val ring3 = new graft.online.ShardedOnlineStore(dirs.take(3).map(pstore))
    put(ring3, bKeys)
    assert(ring3.growPending && ring3.growSizes == Seq(2))
    val ring4 = new graft.online.ShardedOnlineStore(dirs.map(pstore))
    put(ring4, cKeys)
    assert(ring4.growPending && ring4.growSizes == Seq(3, 2),
      s"markers must record BOTH pre-grow sizes, got ${ring4.growSizes}")
    // the scenario is only exercised if some era-B key's ring-3 home
    // differs from both its ring-4 and ring-2 homes
    def homeAt(k: Long, sz: Int) = graft.online.ShardedOnlineStore.shardOf(
      graft.online.EntityKeyCodec.hexKey(Seq("driver_id" -> k)), sz)
    val needRing3 = bKeys.filter(k =>
      homeAt(k, 3) != homeAt(k, 4) && homeAt(k, 3) != homeAt(k, 2))
    assert(needRing3.nonEmpty, "test data must exercise the ring-3 probe")
    // EVERY era serves through the multi-size fallback, pre-rebalance
    val all = aKeys ++ bKeys ++ cKeys
    val got = ring4.read("p", view, Seq("driver_id"),
      all.map(k => Seq("driver_id" -> k)), Seq("v1"))
    all.zip(got).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 1.0,
        s"key $k must serve through the multi-size fallback: ${m("v1")}")
    }
    // deletes fan out across ALL marked sizes: tombstone a key whose
    // live copy sits on its ring-3 home — the fallback must not
    // resurrect it
    val dk = needRing3.head
    ring4.delete("p", view, Seq("driver_id"), Seq(dk).toDF("driver_id"))
    val delGot = ring4.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> dk)), Seq("v1"))
    assert(delGot.head._2("v1").status == "NOT_FOUND",
      "multi-size delete fan-out must hold the tombstone")
    // rebalance + commit converges the whole history
    val moved = ring4.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(moved > 0)
    ring4.commitRingMarkers()
    assert(!ring4.growPending && ring4.growSizes.isEmpty)
    val after = ring4.read("p", view, Seq("driver_id"),
      all.map(k => Seq("driver_id" -> k)), Seq("v1"))
    all.zip(after).foreach { case (k, (_, m)) =>
      val want = if (k == dk) "NOT_FOUND" else "PRESENT"
      assert(m("v1").status == want, s"key $k after rebalance: ${m("v1").status} != $want")
    }
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("rebalance tombstone compensation (parquet): a client delete racing the move is never resurrected (review r16)") {
    import spark.implicits._
    // the race: rebalance dumps key K from its source shard; a client
    // tombstones K (the grow-window fan-out removes it EVERYWHERE);
    // rebalance's upsert then re-inserts its stale copy at K's correct
    // grown-ring home, where no re-run ever sees it as misplaced — a
    // permanent resurrection (r16 code-review #1). The compensation
    // re-reads the source after the upserts: a dumped key now absent
    // was tombstoned, so exactly OUR copied version is removed from
    // the target. Injection: the FIRST child.upsert during rebalance
    // runs the client delete before applying — i.e. the tombstone
    // lands wholly between dump and upsert, the common shape.
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftcomp").toString)
    @volatile var armed = false
    @volatile var injected: () => Unit = () => ()
    class Hooked(d: String) extends ParquetOnlineStore(d, numBuckets = 2) {
      override def upsert(project: String, view: FeatureView,
          joinKeys: Seq[String], df: org.apache.spark.sql.DataFrame,
          tsCol: String, createdCol: Option[String]): Unit = {
        if (armed) { armed = false; injected() }
        super.upsert(project, view, joinKeys, df, tsCol, createdCol)
      }
    }
    val view = FeatureView("cp", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 120L).toIndexedSeq
    val old3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    old3.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 3.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown = new graft.online.ShardedOnlineStore(dirs.map(d => new Hooked(d)))
    val movedKeys = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) != old3.shardOf(Seq("driver_id" -> k)))
    // victim: a moved key whose SOURCE is shard 0 — rebalance processes
    // children in order, so the first upsert belongs to child 0's page
    val victim = movedKeys.find(k => old3.shardOf(Seq("driver_id" -> k)) == 0)
      .getOrElse(fail("need a moved key sourced on shard 0"))
    injected = () => grown.delete("p", view, Seq("driver_id"),
      Seq(victim).toDF("driver_id"))
    armed = true
    val moved = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(!armed, "the injection must have fired")
    assert(moved == movedKeys.size - 1,
      s"the tombstoned key must not count as moved: $moved vs ${movedKeys.size}")
    grown.commitRingMarkers()
    // the victim stays deleted — composite AND every direct child probe
    val got = grown.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> victim)), Seq("v1"))
    assert(got.head._2("v1").status == "NOT_FOUND",
      s"tombstoned key resurrected through the composite: ${got.head}")
    grown.children.zipWithIndex.foreach { case (c, i) =>
      val direct = c.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> victim)), Seq("v1"))
      assert(direct.head._2("v1").status == "NOT_FOUND",
        s"tombstoned key's stale copy survives on shard $i")
    }
    // every other key serves; a re-run converges with nothing to move
    val others = keys.filterNot(_ == victim)
    val rest = grown.read("p", view, Seq("driver_id"),
      others.map(k => Seq("driver_id" -> k)), Seq("v1"))
    others.zip(rest).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 3.0, s"key $k: ${m("v1")}")
    }
    assert(grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None) == 0L)
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("rebalance tombstone compensation (jdbc): a client delete racing the move is never resurrected (review r16)") {
    import spark.implicits._
    val dbs = IndexedSeq.fill(3)(
      java.nio.file.Files.createTempDirectory("graftjcomp").toString + "/db")
    @volatile var armed = false
    @volatile var injected: () => Unit = () => ()
    class Hooked(d: String) extends graft.online.JdbcOnlineStore(
        graft.online.JdbcOnlineStore.derbyUrl(d)) {
      override private[graft] def upsertRaw(project: String, view: String,
          rows: Seq[graft.online.JdbcOnlineStore.RawRow]): Unit = {
        if (armed) { armed = false; injected() }
        super.upsertRaw(project, view, rows)
      }
    }
    val view = FeatureView("jc", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 80L).toIndexedSeq
    val old2 = new graft.online.ShardedOnlineStore(dbs.take(2).map(new Hooked(_)))
    old2.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 5.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown = new graft.online.ShardedOnlineStore(dbs.map(new Hooked(_)))
    val movedKeys = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) != old2.shardOf(Seq("driver_id" -> k)))
    val victim = movedKeys.find(k => old2.shardOf(Seq("driver_id" -> k)) == 0)
      .getOrElse(fail("need a moved key sourced on shard 0"))
    injected = () => grown.delete("p", view, Seq("driver_id"),
      Seq(victim).toDF("driver_id"))
    armed = true
    val moved = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(!armed, "the injection must have fired")
    assert(moved == movedKeys.size - 1,
      s"the tombstoned key must not count as moved: $moved vs ${movedKeys.size}")
    grown.commitRingMarkers()
    val got = grown.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> victim)), Seq("v1"))
    assert(got.head._2("v1").status == "NOT_FOUND",
      s"tombstoned key resurrected through the composite: ${got.head}")
    grown.children.zipWithIndex.foreach { case (c, i) =>
      val direct = c.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> victim)), Seq("v1"))
      assert(direct.head._2("v1").status == "NOT_FOUND",
        s"tombstoned key's stale copy survives on shard $i")
    }
    val others = keys.filterNot(_ == victim)
    val rest = grown.read("p", view, Seq("driver_id"),
      others.map(k => Seq("driver_id" -> k)), Seq("v1"))
    others.zip(rest).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 5.0, s"key $k: ${m("v1")}")
    }
    assert(grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None) == 0L)
  }

  test("sharded grow window: a delete fans out to the key's OLD home, so the fallback never resurrects a tombstone") {
    import spark.implicits._
    // review r15: the grow fallback re-probes a missed key's pre-grow
    // home — a delete routed ONLY to the new winner would leave the
    // old copy for the fallback to serve back (a resurrected
    // tombstone). While growPending, delete fans to both homes.
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftgrowdel").toString)
    val view = FeatureView("gd", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 120L).toIndexedSeq
    val old3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    old3.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 5.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    // pick MOVED keys (old copy still on the pre-grow home) and delete
    // them through the grown composite BEFORE any rebalance
    val moved = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) == 3).take(5)
    assert(moved.nonEmpty)
    grown.delete("p", view, Seq("driver_id"),
      moved.toDF("driver_id"))
    assert(grown.growPending, "delete must have observed the grow window")
    val got = grown.read("p", view, Seq("driver_id"),
      moved.map(k => Seq("driver_id" -> k)), Seq("v1"))
    got.zip(moved).foreach { case ((_, m), k) =>
      assert(m("v1").status == "NOT_FOUND",
        s"deleted key $k must stay deleted through the grow fallback: ${m("v1")}")
    }
    // un-deleted moved keys still serve through the fallback
    val kept = keys.filter(k =>
      grown.shardOf(Seq("driver_id" -> k)) == 3 && !moved.contains(k)).take(5)
    val keptGot = grown.read("p", view, Seq("driver_id"),
      kept.map(k => Seq("driver_id" -> k)), Seq("v1"))
    keptGot.zip(kept).foreach { case ((_, m), k) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 5.0, s"kept key $k: ${m("v1")}")
    }
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("sharded rebalance crash recovery: torn state stays servable with rows on the target; a RE-RUN converges") {
    import spark.implicits._
    // VERDICT r14 #2: the move is upsert-into-target THEN
    // delete-from-source. Inject a crash exactly between them (the
    // first source-delete throws once) and pin: (a) the torn state
    // already has the crashed child's moved rows ON THE TARGET — this
    // assertion goes red if anyone reorders the delete before the
    // upsert; (b) the composite serves every key on the torn state
    // (the duplicate on the source is invisible: HRW routes to the
    // target); (c) re-running rebalance IS the recovery — it
    // reconverges to the clean end state with no duplicates.
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    class CrashyStore(dir: String) extends ParquetOnlineStore(dir, numBuckets = 2) {
      override def delete(project: String, view: FeatureView,
          joinKeys: Seq[String], keysDf: org.apache.spark.sql.DataFrame): Unit = {
        if (failOnce.getAndSet(false))
          throw new RuntimeException("injected crash before source-delete")
        super.delete(project, view, joinKeys, keysDf)
      }
    }
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftrebcr").toString)
    val view = FeatureView("cv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 120L).toIndexedSeq
    val old3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    old3.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 2.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new CrashyStore(d): graft.online.OnlineStore) :+
        new ParquetOnlineStore(dirs(3), numBuckets = 2))
    val movedKeys = keys.filter(k => grown.shardOf(Seq("driver_id" -> k)) == 3)
    assert(movedKeys.nonEmpty)

    val crash = intercept[RuntimeException] {
      grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    }
    assert(crash.getMessage.contains("injected"), crash.getMessage)

    // (a) the reorder tripwire: the first migrating child's moved rows
    // landed on the target BEFORE its delete crashed
    val firstSrc = (0 to 2).find(i => movedKeys.exists(k =>
      old3.shardOf(Seq("driver_id" -> k)) == i)).get
    val firstMoved = movedKeys.filter(k =>
      old3.shardOf(Seq("driver_id" -> k)) == firstSrc)
    val onTarget = grown.children(3).read("p", view, Seq("driver_id"),
      firstMoved.map(k => Seq("driver_id" -> k)), Seq("v1"))
    assert(onTarget.forall(_._2("v1").status == "PRESENT"),
      "torn state must already have the moved rows ON THE TARGET — " +
        "the source-delete must never run before the target-upsert")

    // (b) every key serves on the torn state
    val torn = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    keys.zip(torn).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 2.0, s"torn-state key $k: ${m("v1")}")
    }

    // (c) re-run converges: the misplaced set is recomputed (nothing
    // was deleted before the crash, so the full set moves again), the
    // LWW upsert is idempotent, and the end state is clean
    val moved2 = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    assert(moved2 == movedKeys.size,
      s"re-run must move the recomputed misplaced set: $moved2 vs ${movedKeys.size}")
    grown.commitRingMarkers()
    val presentPerChild = grown.children.map { c =>
      c.read("p", view, Seq("driver_id"),
        keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
        .count(_._2("v1").status == "PRESENT")
    }
    assert(presentPerChild.sum == keys.size,
      s"clean end state: no duplicates, no losses — $presentPerChild")
    val after = grown.read("p", view, Seq("driver_id"),
      keys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    keys.zip(after).foreach { case (k, (_, m)) =>
      assert(m("v1").status == "PRESENT" &&
        m("v1").value.asInstanceOf[Double] == k * 2.0, s"post-recovery key $k: ${m("v1")}")
    }
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("serve-during-rebalance stress: point reads never miss a key while the migration runs") {
    import spark.implicits._
    // VERDICT r14 #3: readers hammer the composite WHILE the
    // grow-by-one migration moves rows. upsert-before-delete ordering
    // plus the grow-window fallback must keep every read PRESENT with
    // the correct value at every instant of the migration.
    val dirs = IndexedSeq.fill(4)(
      java.nio.file.Files.createTempDirectory("graftrebsrv").toString)
    val view = FeatureView("sv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val keys = (0L until 300L).toIndexedSeq
    val old3 = new graft.online.ShardedOnlineStore(
      dirs.take(3).map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    old3.upsert("p", view, Seq("driver_id"),
      keys.map(k => (k, ts("2024-02-01 10:00:00"), k * 3.0))
        .toDF("driver_id", "et", "v1"), "et", None)
    val grown = new graft.online.ShardedOnlineStore(
      dirs.map(d => new ParquetOnlineStore(d, numBuckets = 2)))
    // latch the ring state (markers record 3 < 4 → fallback armed)
    grown.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 0L)), Seq("v1"))
    assert(grown.growPending)

    @volatile var stop = false
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val readers = (1 to 4).map { t =>
      val th = new Thread(() => {
        val rnd = new scala.util.Random(t)
        while (!stop) {
          val picked = IndexedSeq.fill(8)(keys(rnd.nextInt(keys.size)))
          try {
            val r = grown.read("p", view, Seq("driver_id"),
              picked.map(k => Seq("driver_id" -> k)), Seq("v1"))
            picked.zip(r).foreach { case (k, (_, m)) =>
              if (m("v1").status != "PRESENT")
                errors.add(s"key $k MISSED during rebalance: ${m("v1").status}")
              else if (m("v1").value.asInstanceOf[Double] != k * 3.0)
                errors.add(s"key $k WRONG value during rebalance: ${m("v1").value}")
            }
          } catch { case e: Throwable => errors.add(s"read threw: $e") }
          reads.incrementAndGet()
        }
      })
      th.setDaemon(true); th.start(); th
    }
    val moved = grown.rebalance(spark, "p", view, Seq("driver_id"), "et", None)
    Thread.sleep(200L) // a few more reads on the post-migration state
    stop = true
    readers.foreach(_.join(30000))
    assert(moved > 0)
    assert(reads.get() >= 8, s"stress must actually overlap the migration (${reads.get()} reads)")
    assert(errors.isEmpty, s"${errors.size} violations, first: ${errors.peek()}")
    dirs.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("storage-level TTL expire: jdbc DELETE twin, sharded-jdbc fan-out, loud error on non-expirable rings") {
    import spark.implicits._
    // VERDICT r14 #3: without a storage-level sweep a JDBC store grows
    // without bound under TTL workloads (the read-time OUTSIDE_MAX_AGE
    // gate protects serves, not disk). Same strictly-older-than
    // semantics as the parquet twin, via the shared
    // ExpirableOnlineStore seam the sharded composite fans out over.
    val view = FeatureView("jx", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ofDays(1), DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    def freshUrl() = graft.online.JdbcOnlineStore.derbyUrl(
      java.nio.file.Files.createTempDirectory("graftjexp").toString + "/db")
    def freshJdbc() = new graft.online.JdbcOnlineStore(freshUrl())
    val stores: Seq[(String, graft.online.OnlineStore)] = Seq(
      "jdbc" -> freshJdbc(),
      "sharded-jdbc" -> new graft.online.ShardedOnlineStore(
        IndexedSeq.fill(3)(freshJdbc())),
      // the byte-layout interop twins expire too (their sqlite/dynamo
      // originals never do — the disk-bounding sweep is parity-plus);
      // reference_sql counts FEATURE rows, which equals key count here
      // (one feature per view)
      "reference-sql" -> new graft.online.ReferenceSqlStore(freshUrl()),
      "reference-doc" -> new graft.online.ReferenceDocStore(freshUrl()))
    stores.foreach { case (label, store) =>
      val rows = (0L until 40L).map(k =>
        (k, if (k % 2 == 0) ts("2020-01-01 00:00:00") else ts("2024-02-01 10:00:00"), k * 1.0))
      store.upsert("p", view, Seq("driver_id"),
        rows.toDF("driver_id", "et", "v1"), "et", None)
      val n = store match {
        case s: graft.online.ShardedOnlineStore =>
          s.expire(spark, "p", view, Seq("driver_id"), "et", ts("2021-01-01 00:00:00"))
        case e: graft.online.ExpirableOnlineStore =>
          e.expire(spark, "p", view, Seq("driver_id"), "et", ts("2021-01-01 00:00:00"))
      }
      assert(n == 20, s"$label: expected 20 expired, got $n")
      val got = store.read("p", view, Seq("driver_id"),
        (0L until 40L).map(k => Seq("driver_id" -> k)), Seq("v1"))
      (0L until 40L).zip(got).foreach { case (k, (_, m)) =>
        val want = if (k % 2 == 0) "NOT_FOUND" else "PRESENT"
        assert(m("v1").status == want, s"$label key $k: ${m("v1").status} != $want")
      }
      // a row exactly AT the cutoff survives (strictly-older-than, the
      // parquet twin's pinned semantics)
      store.upsert("p", view, Seq("driver_id"),
        Seq((500L, ts("2021-06-01 00:00:00"), 5.0)).toDF("driver_id", "et", "v1"),
        "et", None)
      val atCutoff = store match {
        case s: graft.online.ShardedOnlineStore =>
          s.expire(spark, "p", view, Seq("driver_id"), "et", ts("2021-06-01 00:00:00"))
        case e: graft.online.ExpirableOnlineStore =>
          e.expire(spark, "p", view, Seq("driver_id"), "et", ts("2021-06-01 00:00:00"))
      }
      assert(atCutoff == 0, s"$label: a row AT the cutoff must survive")
      // a never-materialized view expires zero rows, loudly not thrown
      val virgin = FeatureView("jx_never", Seq("driver"),
        Seq(Feature("v1", GraftType.Dbl)), Duration.ofDays(1),
        DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
          .toDF("driver_id", "et", "v1"), "et"))
      val zero = store match {
        case s: graft.online.ShardedOnlineStore =>
          s.expire(spark, "p", virgin, Seq("driver_id"), "et", ts("2021-01-01 00:00:00"))
        case e: graft.online.ExpirableOnlineStore =>
          e.expire(spark, "p", virgin, Seq("driver_id"), "et", ts("2021-01-01 00:00:00"))
      }
      assert(zero == 0L, s"$label: never-materialized view must expire 0")
    }
    // a ring with a non-expirable child refuses loudly up front
    val memRing = new graft.online.ShardedOnlineStore(
      IndexedSeq.fill(2)(new InMemoryOnlineStore()))
    val e = intercept[UnsupportedOperationException] {
      memRing.expire(spark, "p", view, Seq("driver_id"), "et",
        ts("2021-01-01 00:00:00"))
    }
    assert(e.getMessage.contains("storage-level expiry"), e.getMessage)
  }

  test("FileLease: a failed token write on the generic (remote-FS) claim path must not strand the slot") {
    // ADVICE r14: the non-local branch previously left an ownerless
    // partial-token lock when the token write failed AFTER the
    // exclusive create — the claimant then spun on its OWN stranded
    // lock until the acquisition budget expired, and every other
    // writer was blocked for the full stale window. The claim must
    // delete the slot before rethrowing so the very next attempt
    // re-claims. (A FilterFileSystem is not a Local/RawLocalFileSystem,
    // so claim() takes the generic fs.create branch — the remote-store
    // code path, driven over local disk.)
    val dir = java.nio.file.Files.createTempDirectory("graftfleaseg").toString
    val raw = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration).getRawFileSystem
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val fs = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        // delegate straight to the wrapped fs (the filter wrapper is
        // never initialize()d with a conf, and the convenience
        // overload would read it)
        val real = raw.create(f, overwrite)
        if (failures.getAndDecrement() > 0)
          new org.apache.hadoop.fs.FSDataOutputStream(
            new java.io.OutputStream {
              override def write(b: Int): Unit =
                throw new java.io.IOException("injected token-write failure")
              override def close(): Unit = real.close()
            }, null)
        else real
      }
    }
    val lock = new org.apache.hadoop.fs.Path(s"$dir/g.lock")
    var entered = false
    // short budget: red (stranded slot → could-not-acquire) without the
    // delete-before-rethrow, green with it (attempt 2 re-claims)
    graft.util.FileLease.withLock(fs, lock, staleMs = 60000L, acquireMs = 5000L) {
      entered = true
    }
    assert(entered, "the retry after a failed token write must re-claim the slot")
    assert(!raw.exists(lock), "release must remove the lock")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("FileLease: the heartbeat stops once the lock was broken and re-claimed by another holder") {
    // ADVICE r14: a holder stalled past staleMs whose lock was broken
    // and re-claimed must NOT keep heartbeating the replacement's lock
    // — if the replacement crashes, the victim's beats would keep the
    // dead lock's mtime fresh indefinitely, wedging every writer. The
    // beat must re-read the token and stop when it is no longer its own.
    val dir = java.nio.file.Files.createTempDirectory("graftfleaseh").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/h.lock")
    val release = new java.util.concurrent.CountDownLatch(1)
    val held = new java.util.concurrent.CountDownLatch(1)
    @volatile var err: Throwable = null
    val holder = new Thread(() => {
      try graft.util.FileLease.withLock(fs, lock, staleMs = 750L, heartbeat = true) {
        held.countDown(); release.await()
      } catch { case e: Throwable => err = e }
    })
    holder.start()
    assert(held.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // simulate: the holder stalled, a breaker captured the lock and a
    // NEW holder re-claimed the path with its own token
    fs.delete(lock, false)
    val out = fs.create(lock, true)
    out.write("replacement-holder-token".getBytes("UTF-8")); out.close()
    // > 2 beat intervals (beat = 250 ms): any in-flight beat lands and
    // the next one observes the foreign token and stops
    Thread.sleep(700L)
    val t0 = fs.getFileStatus(lock).getModificationTime
    Thread.sleep(900L)
    val t1 = fs.getFileStatus(lock).getModificationTime
    assert(t1 == t0,
      s"the victim's heartbeat must stop touching a re-claimed lock ($t0 -> $t1)")
    release.countDown()
    holder.join(10000)
    assert(err == null, s"the body must finish on degraded terms, not throw: $err")
    // the release path restores the foreign lock it cannot prove dead
    val in = fs.open(lock)
    val tok = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    assert(tok == "replacement-holder-token",
      "release must leave the replacement holder's lock in place")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("multiget orphaned-.old fast path fires only on a STALE .old — a fresh (live-swap) .old keeps the full retry envelope") {
    import spark.implicits._
    // ADVICE r14: identical consecutive listings alone are a ~6 ms
    // window; a LIVE writer stalled between rename-out and rename-in
    // by an ordinary GC pause would hit the early exit and serve a
    // false NOT_FOUND. The exit now also requires the .old root's
    // mtime to be older than the orphan bound, so a fresh .old keeps
    // the r13 ~126 ms envelope and a genuine crash orphan ages into
    // the ~6 ms fast path.
    val base = java.nio.file.Files.createTempDirectory("graftorph").toString
    val store = new ParquetOnlineStore(base, numBuckets = 2)
    val view = FeatureView("ov", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    // view "ov" is NEVER written — every requested bucket resolves
    // empty, which (with a .old root present) is exactly the retry
    // trigger; a sibling view holds a row to pin present-key reads
    val view2 = view.copy(name = "ov2")
    store.upsert("p", view2, Seq("driver_id"),
      Seq((1L, ts("2024-02-01 10:00:00"), 1.0)).toDF("driver_id", "et", "v1"),
      "et", None)
    def missWall(): Double = {
      val t0 = System.nanoTime()
      val r = store.read("p", view, Seq("driver_id"),
        Seq(Seq("driver_id" -> 999999L)), Seq("v1"))
      assert(r.head._2("v1").status == "NOT_FOUND")
      (System.nanoTime() - t0) / 1e6
    }
    missWall() // warm (marker + codegen paths), no .old present
    // fabricate a FRESH .old root — a live swap mid-window: the read
    // must pay the full bounded envelope (>= 126 ms of sleeps), never
    // the early exit
    val oldRoot = new java.io.File(s"$base/p/ov.old")
    assert(oldRoot.mkdirs())
    val fresh = missWall()
    assert(fresh >= 100.0,
      f"a fresh .old must keep the full retry envelope, got $fresh%.1f ms")
    // age it past the orphan bound — a crash leftover: the no-progress
    // early exit may now fire (~6 ms of backoff, far under the envelope)
    assert(oldRoot.setLastModified(
      System.currentTimeMillis() - 60000L))
    val orphaned = missWall()
    assert(orphaned < 100.0,
      f"a stale orphan .old must take the early exit, got $orphaned%.1f ms")
    // present keys (sibling view) unaffected throughout
    val ok = store.read("p", view2, Seq("driver_id"),
      Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    assert(ok.head._2("v1").status == "PRESENT")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("FileLease: acquisition budget — fail fast on a tiny budget, queue behind a live holder on a sized one") {
    // review r14: the default budget (staleMs+5s) assumed short
    // critical sections — a contender must be able to QUEUE behind a
    // live heartbeat-extended holder with acquireMs sized to the
    // longest legitimate section (the store writer lease's contract)
    val dir = java.nio.file.Files.createTempDirectory("graftfleaseb").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/t.lock")
    val release = new java.util.concurrent.CountDownLatch(1)
    val heldAt = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      graft.util.FileLease.withLock(fs, lock, staleMs = 60000L) {
        heldAt.countDown(); release.await()
      }
    })
    holder.start()
    assert(heldAt.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // tiny budget: fails fast (not after staleMs+5s)
    val t0 = System.currentTimeMillis()
    intercept[java.io.IOException] {
      graft.util.FileLease.withLock(fs, lock, staleMs = 60000L, acquireMs = 400L) { () }
    }
    assert(System.currentTimeMillis() - t0 < 5000L, "tiny budget must fail fast")
    // sized budget: queues until the holder releases, then enters
    @volatile var entered = false
    val contender = new Thread(() => {
      graft.util.FileLease.withLock(fs, lock, staleMs = 60000L, acquireMs = 30000L) {
        entered = true
      }
    })
    contender.start()
    Thread.sleep(500L)
    assert(!entered, "contender must wait while the holder is live")
    release.countDown()
    contender.join(30000)
    holder.join(10000)
    assert(entered, "sized budget must acquire once the holder releases")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("writer lease: two concurrent upsert storms lose no updates (final state = sequential LWW)") {
    import spark.implicits._
    // VERDICT r13 #2: without the table-scoped writer lease, two
    // concurrent writers both do read-buckets → merge → swap and the
    // interleaved loser's merge silently discards the winner's rows.
    // Two threads upsert DISJOINT key ranges for `rounds` rounds on
    // one table (smallStoreBytes = 0 forces the incremental per-bucket
    // path — the widest race surface); with the lease the final state
    // must contain EVERY key at its final value, exactly the
    // sequential-LWW outcome.
    val base = java.nio.file.Files.createTempDirectory("graftlease").toString
    val store = new ParquetOnlineStore(base, numBuckets = 4, smallStoreBytes = 0L)
    val view = FeatureView("lv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    def batch(keyBase: Long, round: Int) =
      (keyBase until keyBase + 16L).map(k =>
          (k, ts(f"2024-02-01 10:00:${round % 60}%02d"), round.toDouble))
        .toDF("driver_id", "et", "v1")
    val rounds = 10
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writers = Seq(0L, 100L).map { kb =>
      val t = new Thread(() => {
        try (1 to rounds).foreach { i =>
          store.upsert("p", view, Seq("driver_id"), batch(kb, i), "et", None)
        } catch { case e: Throwable => errors.add(s"writer $kb threw: $e") }
      })
      t.start(); t
    }
    writers.foreach(_.join(300000))
    assert(errors.isEmpty, s"writers failed: ${errors.toArray.mkString("; ")}")
    val allKeys = ((0L until 16L) ++ (100L until 116L)).toIndexedSeq
    val got = store.read("p", view, Seq("driver_id"),
      allKeys.map(k => Seq("driver_id" -> k)), Seq("v1"))
    val lost = allKeys.zip(got).collect {
      case (k, (_, m)) if m("v1").status != "PRESENT" => s"key $k LOST"
      case (k, (_, m)) if m("v1").value.asInstanceOf[Double] != rounds.toDouble =>
        s"key $k stale: ${m("v1").value} != $rounds"
    }
    assert(lost.isEmpty, s"lost updates under concurrent writers: ${lost.mkString("; ")}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("writer lease: upsert actually serializes on the table lease (blocked while held)") {
    import spark.implicits._
    // Deterministic mutual-exclusion pin (the red path without relying
    // on winning a race): hold the table's writer lock directly via
    // FileLease; an upsert launched meanwhile must NOT complete until
    // the hold releases. If a future edit drops the lease from the
    // upsert path, this goes red immediately.
    val base = java.nio.file.Files.createTempDirectory("graftlease2").toString
    val store = new ParquetOnlineStore(base, numBuckets = 2)
    val view = FeatureView("bv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double)]
        .toDF("driver_id", "et", "v1"), "et"))
    val df = Seq((1L, ts("2024-02-01 10:00:00"), 1.0)).toDF("driver_id", "et", "v1")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$base/p/bv.writer.lock")
    val release = new java.util.concurrent.CountDownLatch(1)
    val heldAt = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      graft.util.FileLease.withLock(fs, lock, staleMs = 60000L) {
        heldAt.countDown()
        release.await()
      }
    })
    holder.start()
    assert(heldAt.await(10, java.util.concurrent.TimeUnit.SECONDS))
    @volatile var done = false
    val writer = new Thread(() => {
      store.upsert("p", view, Seq("driver_id"), df, "et", None)
      done = true
    })
    writer.start()
    Thread.sleep(1500L)
    assert(!done, "upsert must block while another holder owns the table lease")
    release.countDown()
    writer.join(60000)
    assert(done, "upsert must proceed once the lease releases")
    holder.join(10000)
    val got = store.read("p", view, Seq("driver_id"),
      Seq(Seq("driver_id" -> 1L)), Seq("v1"))
    assert(got.head._2("v1").status == "PRESENT")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("FileLease: stale-holder break, heartbeat keep-alive, orphaned-lock self-heal") {
    val dir = java.nio.file.Files.createTempDirectory("graftflease").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/t.lock")
    // 1. crashed holder: a lock file with an ancient mtime must be
    // broken and re-acquired well inside the staleMs + 5 s budget
    val out = fs.create(lock, false)
    out.write("dead-holder-token".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 3600_000L, -1L)
    var entered = false
    graft.util.FileLease.withLock(fs, lock, staleMs = 1000L) { entered = true }
    assert(entered, "stale lock must be broken and acquired")
    assert(!fs.exists(lock), "release must remove the lock")
    // 2. heartbeat: a LIVE holder whose section outlives staleMs keeps
    // the lock's mtime fresh, so a contender's stale check never fires
    // — observed directly: mtime advances while held
    @volatile var mt0 = 0L
    @volatile var mt1 = 0L
    graft.util.FileLease.withLock(fs, lock, staleMs = 900L, heartbeat = true) {
      mt0 = fs.getFileStatus(lock).getModificationTime
      Thread.sleep(1200L)
      mt1 = fs.getFileStatus(lock).getModificationTime
    }
    assert(mt1 > mt0, s"heartbeat must advance the lock mtime ($mt0 -> $mt1)")
    assert(!fs.exists(lock))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("serve-during-maintenance stress: concurrent reads vs upsert/expire — no torn reads, at-worst-one-swap-stale") {
    import spark.implicits._
    // VERDICT r12 next-round #7: the block cache, rename-aside swaps
    // and expiry are individually crash/stale-pinned; this hammers
    // `read` from N threads WHILE upsert + expire loop and asserts the
    // cross-cutting contract: every read returns internally CONSISTENT
    // rows (v2 == v1*1000+7 — both columns from the same committed
    // batch, never torn across a swap) at a version no older than ONE
    // completed swap behind the fence the reader observed.
    val base = java.nio.file.Files.createTempDirectory("graftstress").toString
    val store = new ParquetOnlineStore(base, numBuckets = 4)
    val keys = (0L until 32L).toIndexedSeq
    val view = FeatureView("sv", Seq("driver"),
      Seq(Feature("v1", GraftType.Dbl), Feature("v2", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(Seq.empty[(Long, Timestamp, Double, Double)]
        .toDF("driver_id", "et", "v1", "v2"), "et"))
    def mainBatch(i: Int) = keys.map(k =>
        (k, ts(f"2024-02-01 10:00:${i % 60}%02d"), i.toDouble, i.toDouble * 1000 + 7))
      .toDF("driver_id", "et", "v1", "v2")
    // ephemeral keys with pre-cutoff timestamps: each expire pass has
    // real rows to remove, so the bucket-rewrite swap runs under load
    def ephBatch(i: Int) = Seq((1000L + i, ts("2020-01-01 00:00:00"),
      -1.0, -993.0)).toDF("driver_id", "et", "v1", "v2")
    store.upsert("p", view, Seq("driver_id"), mainBatch(0), "et", None)
    val saved = java.nio.file.Files.createTempDirectory("graftstress_saved").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$base/p/sv"), new java.io.File(saved))

    // the checker both the live readers and the red-path reuse: returns
    // the violations of (consistency, staleness-bound) for one read
    def violations(fence: Int): Seq[String] = {
      val picked = keys.take(8)
      val r = store.read("p", view, Seq("driver_id"),
        picked.map(k => Seq("driver_id" -> k)), Seq("v1", "v2"))
      r.zip(picked).flatMap { case ((_, m), k) =>
        if (m("v1").status != "PRESENT" || m("v2").status != "PRESENT")
          Seq(s"key $k missing during maintenance: ${m("v1").status}/${m("v2").status}")
        else {
          val (a, b) = (m("v1").value.asInstanceOf[Double], m("v2").value.asInstanceOf[Double])
          val torn = if (b != a * 1000 + 7) Seq(s"key $k TORN: v1=$a v2=$b") else Nil
          val stale = if (a < fence - 1)
            Seq(s"key $k STALE beyond one swap: v1=$a fence=$fence") else Nil
          torn ++ stale
        }
      }
    }

    @volatile var completed = 0
    @volatile var stop = false
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val readers = (1 to 4).map { _ =>
      val t = new Thread(() => {
        while (!stop) {
          val fence = completed
          try violations(fence).foreach(errors.add)
          catch { case e: Throwable => errors.add(s"read threw: $e") }
          reads.incrementAndGet()
        }
      })
      t.setDaemon(true); t.start(); t
    }
    val rounds = 15
    for (i <- 1 to rounds) {
      store.upsert("p", view, Seq("driver_id"),
        mainBatch(i).unionByName(ephBatch(i)), "et", None)
      completed = i
      if (i % 5 == 0) {
        val n = store.expire(spark, "p", view, Seq("driver_id"), "et",
          ts("2021-01-01 00:00:00"))
        assert(n >= 1, s"expire pass $i must remove the ephemeral rows, got $n")
      }
    }
    stop = true
    readers.foreach(_.join(30000))
    assert(reads.get() >= 20, s"stress must actually interleave reads, got ${reads.get()}")
    assert(errors.isEmpty, s"torn/stale/missing reads: ${errors.toArray.take(5).mkString("; ")}")

    // RED-PATH: a deliberately BROKEN swap — the live table silently
    // replaced with the pre-stress copy (no invalidation, mtime/length
    // changed) — must be caught by the SAME checker: the re-decoded
    // rows are version 0, far beyond the one-swap staleness bound
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$base/p/sv"))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(saved), new java.io.File(s"$base/p/sv"))
    val caught = violations(rounds)
    assert(caught.exists(_.contains("STALE")),
      s"checker must flag the broken swap, got: $caught")
    store.teardown("p", Seq(view))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(saved))
  }
}
