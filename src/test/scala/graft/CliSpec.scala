package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.{Cli, RepoConfig}
import graft.registry.Registry
import graft.store.FeatureStore

/** End-to-end CLI lifecycle, mirroring the reference's
  * tests/test_e2e_local.py:50-131: apply a repo config, materialize,
  * read online (latest row per key), failure path for a missing join
  * key, then teardown. */
class CliSpec extends AnyFunSuite {

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

  test("CLI e2e: apply -> materialize -> list -> online read -> teardown") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli").toString
    Seq(
      (1001L, ts("2024-01-01 10:00:00"), 0.2),
      (1001L, ts("2024-01-02 10:00:00"), 0.8),
      (2002L, ts("2024-01-01 12:00:00"), 0.5))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/driver_stats.parquet")

    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "project": "e2e",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "parquet", "path": "$dir/store"},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "driver_hourly_stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/driver_stats.parquet",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin.getBytes("UTF-8"))

    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    assert(out.last.contains("applied 1 entities, 1 feature views"))

    Cli.run(Seq("entities", "list", cfgPath), spark, out.append(_))
    assert(out.last.startsWith("driver\tdriver_id\tINT64"))
    Cli.run(Seq("feature-views", "list", cfgPath), spark, out.append(_))
    assert(out.last.contains("driver_hourly_stats"))

    Cli.run(Seq("materialize", cfgPath, "2024-01-01", "2024-01-03"), spark, out.append(_))

    // online read through the same repo config (reference reads via SDK)
    val cfg = RepoConfig.load(cfgPath)
    val fs = new FeatureStore(cfg.project, new Registry(Some(cfg.registryPath)),
      cfg.onlineStore, spark)
    val resp = fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
      Seq(Map[String, Any]("driver_id" -> 1001L),
        Map[String, Any]("driver_id" -> 2002L),
        Map[String, Any]("driver_id" -> 404L)))
    assert(resp.toMap("driver_hourly_stats:conv_rate") == Seq(0.8, 0.5, null))
    assert(resp.statuses("driver_hourly_stats:conv_rate") == Seq("PRESENT", "PRESENT", "NOT_FOUND"))

    // registry-dump emits the applied definitions
    Cli.run(Seq("registry-dump", cfgPath), spark, out.append(_))
    assert(out.last.contains("driver_hourly_stats") && out.last.contains("materializations"))

    // failure path (test_e2e_local.py:110-131): missing join key -> error
    intercept[IllegalArgumentException] {
      fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
        Seq(Map[String, Any]("not_a_key" -> 1L)))
    }
    // unknown command -> error
    intercept[IllegalArgumentException] {
      Cli.run(Seq("frobnicate", cfgPath), spark, _ => ())
    }

    Cli.run(Seq("teardown", cfgPath), spark, out.append(_))
    val reg2 = new Registry(Some(s"$dir/registry.json"))
    assert(reg2.listFeatureViews.isEmpty && reg2.listEntities.isEmpty)
  }

  test("repo config wires the HRW-sharded composite store (sharded_parquet)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli_shard").toString
    Seq(
      (1001L, ts("2024-01-01 10:00:00"), 0.2),
      (1001L, ts("2024-01-02 10:00:00"), 0.8),
      (2002L, ts("2024-01-01 12:00:00"), 0.5))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/driver_stats.parquet")
    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "project": "shd",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "sharded_parquet",
         |    "paths": ["$dir/s0", "$dir/s1", "$dir/s2"], "num_buckets": 2},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "driver_hourly_stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/driver_stats.parquet",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin.getBytes("UTF-8"))
    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("materialize", cfgPath, "2024-01-01", "2024-01-03"), spark, out.append(_))
    val cfg = RepoConfig.load(cfgPath)
    assert(cfg.onlineStore.isInstanceOf[graft.online.ShardedOnlineStore])
    val fs = new FeatureStore(cfg.project, new Registry(Some(cfg.registryPath)),
      cfg.onlineStore, spark)
    val resp = fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
      Seq(Map[String, Any]("driver_id" -> 1001L),
        Map[String, Any]("driver_id" -> 2002L),
        Map[String, Any]("driver_id" -> 404L)))
    assert(resp.toMap("driver_hourly_stats:conv_rate") == Seq(0.8, 0.5, null))
    // misconfig: missing/empty paths is a loud error, not a default
    intercept[IllegalArgumentException] {
      RepoConfig.load {
        val p = s"$dir/bad.json"
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          s"""{"project":"x","registry":"$dir/r.json",
             |"online_store":{"type":"sharded_parquet","paths":[]},
             |"entities":[],"feature_views":[]}""".stripMargin.getBytes("UTF-8"))
        p
      }
    }
    Cli.run(Seq("teardown", cfgPath), spark, out.append(_))
  }

  test("CLI rebalance: grow a sharded_parquet ring 3→4 end-to-end (apply → rebalance → every key serves)") {
    import spark.implicits._
    // VERDICT r14 #1: the designed growth path must be drivable from a
    // repo config, not library code — materialize on a 3-ring, append a
    // 4th path, apply, `rebalance`, and every key serves from the grown
    // ring with the moved count printed.
    val dir = java.nio.file.Files.createTempDirectory("graftcli_grow").toString
    val keys = (0L until 60L).toIndexedSeq
    keys.map(k => (k, ts("2024-01-02 10:00:00"), k * 0.5))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/driver_stats.parquet")
    def cfgJson(paths: Seq[String]): String =
      s"""{
         |  "project": "grw",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "sharded_parquet",
         |    "paths": [${paths.map(p => s""""$p"""").mkString(", ")}], "num_buckets": 2},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "driver_hourly_stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/driver_stats.parquet",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin
    val cfgPath = s"$dir/repo.json"
    val ring3 = (0 to 2).map(i => s"$dir/s$i")
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      cfgJson(ring3).getBytes("UTF-8"))
    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("materialize", cfgPath, "2024-01-01", "2024-01-03"), spark, out.append(_))
    // GROW: append the 4th path (the ring is positional — append only)
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      cfgJson(ring3 :+ s"$dir/s3").getBytes("UTF-8"))
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("rebalance", cfgPath), spark, out.append(_))
    val line = out.find(_.startsWith("rebalanced")).getOrElse(fail(s"no rebalance output in $out"))
    val moved = "moved (\\d+) row".r.findFirstMatchIn(line)
      .getOrElse(fail(s"no moved count in '$line'")).group(1).toInt
    assert(moved > 0 && moved < keys.size,
      s"grow-by-one must move a ~1/4 sliver, not $moved of ${keys.size}")
    // every key serves from the grown ring
    val cfg = RepoConfig.load(cfgPath)
    val fs = new FeatureStore(cfg.project, new Registry(Some(cfg.registryPath)),
      cfg.onlineStore, spark)
    val resp = fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
      keys.map(k => Map[String, Any]("driver_id" -> k)))
    assert(resp.toMap("driver_hourly_stats:conv_rate") == keys.map(_ * 0.5),
      "every key must serve from the grown ring after rebalance")
    // per-view variant also runs (single-view store → markers commit);
    // the r16 --parallel flag parses beside the view argument
    Cli.run(Seq("rebalance", cfgPath, "driver_hourly_stats", "--parallel=2"),
      spark, out.append(_))
    assert(out.exists(_.contains("rebalanced driver_hourly_stats: moved 0 row(s)")),
      s"a second rebalance must be a converged no-op: $out")
    // loud error on a non-sharded config, the expire-online sibling rule
    val memCfg = s"$dir/mem.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(memCfg),
      s"""{"project":"grw2","registry":"$dir/reg2.json",
         |"online_store":{"type":"memory"},
         |"entities":[],"feature_views":[]}""".stripMargin.getBytes("UTF-8"))
    Cli.run(Seq("apply", memCfg), spark, out.append(_))
    val e = intercept[IllegalArgumentException] {
      Cli.run(Seq("rebalance", memCfg), spark, out.append(_))
    }
    assert(e.getMessage.contains("sharded_parquet"), e.getMessage)
    Cli.run(Seq("teardown", cfgPath), spark, out.append(_))
  }

  test("CLI rebalance: grow a sharded_jdbc ring 2→3 end-to-end (VERDICT r15 #1 stretch)") {
    import spark.implicits._
    // the JDBC twin of the parquet grow e2e: materialize on a 2-ring of
    // Derby databases, append a 3rd URL, rebalance, every key serves,
    // second run is a converged no-op
    val dir = java.nio.file.Files.createTempDirectory("graftcli_jgrow").toString
    val keys = (0L until 60L).toIndexedSeq
    keys.map(k => (k, ts("2024-01-02 10:00:00"), k * 0.25))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/driver_stats.parquet")
    def cfgJson(dbs: Seq[String]): String =
      s"""{
         |  "project": "jgrw",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "sharded_jdbc",
         |    "paths": [${dbs.map(p => s""""$p"""").mkString(", ")}]},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "driver_hourly_stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/driver_stats.parquet",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin
    val cfgPath = s"$dir/repo.json"
    val ring2 = (0 to 1).map(i => s"$dir/db$i")
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      cfgJson(ring2).getBytes("UTF-8"))
    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("materialize", cfgPath, "2024-01-01", "2024-01-03"), spark, out.append(_))
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      cfgJson(ring2 :+ s"$dir/db2").getBytes("UTF-8"))
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("rebalance", cfgPath), spark, out.append(_))
    val line = out.find(_.startsWith("rebalanced")).getOrElse(fail(s"no rebalance output in $out"))
    val moved = "moved (\\d+) row".r.findFirstMatchIn(line)
      .getOrElse(fail(s"no moved count in '$line'")).group(1).toInt
    assert(moved > 0 && moved < keys.size,
      s"grow-by-one must move a ~1/3 sliver, not $moved of ${keys.size}")
    val cfg = RepoConfig.load(cfgPath)
    val fs = new FeatureStore(cfg.project, new Registry(Some(cfg.registryPath)),
      cfg.onlineStore, spark)
    val resp = fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
      keys.map(k => Map[String, Any]("driver_id" -> k)))
    assert(resp.toMap("driver_hourly_stats:conv_rate") == keys.map(_ * 0.25),
      "every key must serve from the grown JDBC ring after rebalance")
    Cli.run(Seq("rebalance", cfgPath, "driver_hourly_stats"), spark, out.append(_))
    assert(out.exists(_.contains("rebalanced driver_hourly_stats: moved 0 row(s)")),
      s"a second rebalance must be a converged no-op: $out")
    Cli.run(Seq("teardown", cfgPath), spark, out.append(_))
  }

  test("repo config wires the reference-layout interop stores (reference_sql, reference_redis)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli_ref").toString
    Seq(
      (1001L, ts("2024-01-01 10:00:00"), 0.2),
      (1001L, ts("2024-01-02 10:00:00"), 0.8),
      (2002L, ts("2024-01-01 12:00:00"), 0.5))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/driver_stats.parquet")
    def cfgJson(project: String, store: String): String =
      s"""{
         |  "project": "$project",
         |  "registry": "$dir/registry_$project.json",
         |  "online_store": $store,
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "driver_hourly_stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/driver_stats.parquet",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin
    def drive(cfgPath: String): Unit = {
      val out = scala.collection.mutable.Buffer[String]()
      Cli.run(Seq("apply", cfgPath), spark, out.append(_))
      Cli.run(Seq("materialize", cfgPath, "2024-01-01", "2024-01-03"), spark, out.append(_))
      val cfg = RepoConfig.load(cfgPath)
      val fs = new FeatureStore(cfg.project, new Registry(Some(cfg.registryPath)),
        cfg.onlineStore, spark)
      val resp = fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
        Seq(Map[String, Any]("driver_id" -> 1001L),
          Map[String, Any]("driver_id" -> 2002L),
          Map[String, Any]("driver_id" -> 404L)))
      assert(resp.toMap("driver_hourly_stats:conv_rate") == Seq(0.8, 0.5, null))
    }

    // reference_sql: serve through the config, then check the raw rows
    // are reference-layout (v1 entity_key bytes)
    val sqlCfg = s"$dir/repo_sql.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(sqlCfg),
      cfgJson("e2esql",
        s"""{"type": "reference_sql", "path": "$dir/refdb"}""").getBytes("UTF-8"))
    drive(sqlCfg)
    val conn = java.sql.DriverManager.getConnection(
      graft.online.JdbcOnlineStore.derbyUrl(s"$dir/refdb"))
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT entity_key FROM e2esql_driver_hourly_stats")
      val eks = Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getBytes(1).map(b => f"${b & 0xff}%02x").mkString).toSet
      rs.close()
      assert(eks.contains("020000006472697665725f69640400000004000000e9030000"),
        s"v1-serialized driver_id=1001 key expected, got $eks")
    } finally conn.close()

    // reference_redis against the in-process RESP server
    val mini = new MiniRedis()
    val redisCfg = s"$dir/repo_redis.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(redisCfg),
      cfgJson("e2ered",
        s"""{"type": "reference_redis", "host": "127.0.0.1", "port": ${mini.port}}""")
        .getBytes("UTF-8"))
    drive(redisCfg)
    assert(mini.keyCount > 0)

    // the engine-native redis store parses from the config too
    val nativeCfg = s"$dir/repo_redis_native.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(nativeCfg),
      cfgJson("e2ern",
        s"""{"type": "redis", "host": "127.0.0.1", "port": ${mini.port}}""")
        .getBytes("UTF-8"))
    drive(nativeCfg)
    mini.stop()
  }

  test("CLI serve: both serving surfaces come up from the repo config and shut down") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli_serve").toString
    Seq((1001L, ts("2024-01-01 10:00:00"), 0.7))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/driver_stats.parquet")
    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "project": "srvcli",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "memory"},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/driver_stats.parquet",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin.getBytes("UTF-8"))
    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("materialize", cfgPath, "2024-01-01", "2024-01-03"), spark, out.append(_))
    val served = new java.util.concurrent.atomic.AtomicReference[String](null)
    val t = new Thread(() =>
      Cli.run(Seq("serve", cfgPath, "0", "0", "15"), spark, line =>
        if (line.startsWith("serving ")) served.set(line)))
    t.start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (served.get() == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val line = served.get()
      assert(line != null, "serve must announce its ports")
      val ports = "\\d+".r.findAllIn(line).map(_.toInt).toSeq
      val Seq(httpPort, grpcPort) = ports
      // HTTP surface answers with materialized data
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:$httpPort/get-online-features"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"features": ["stats:conv_rate"], "entity_rows": [{"driver_id": 1001}]}"""))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200 && resp.body().contains("0.7"), resp.body())
      // gRPC surface is listening (full wire exercised in ServingSpec)
      val s = new java.net.Socket("127.0.0.1", grpcPort)
      s.close()
    } finally {
      t.interrupt()
      t.join(10000)
      assert(!t.isAlive, "serve must shut down on interrupt")
    }
  }

  test("CLI vacuum + compact maintain a date-partitioned source through the repo config") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli_vac").toString
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-02 10:00:00"), 2.0),
      (3L, ts("2024-01-03 10:00:00"), 3.0))
      .toDF("driver_id", "event_timestamp", "conv_rate")
    // six appended single-file writes per day: the micro-batch
    // fragmentation pattern compact exists for
    (0 until 6).foreach { i =>
      graft.sources.DatePartition.write(df.coalesce(1), s"$dir/stats",
        "event_timestamp", "event_date", mode = if (i == 0) "overwrite" else "append")
    }

    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "project": "vac",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "memory"},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 0,
         |     "batch_source": {"kind": "file", "path": "$dir/stats",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": "event_date"},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin.getBytes("UTF-8"))

    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    // six appended files per day -> compact collapses each day to 1
    Cli.run(Seq("compact", cfgPath, "stats"), spark, out.append(_))
    assert(out.last.contains("-> 1 files"))
    Cli.run(Seq("vacuum", cfgPath, "stats", "2024-01-03"), spark, out.append(_))
    assert(out.last.contains("event_date=2024-01-01") &&
      out.last.contains("event_date=2024-01-02"))
    // six appended copies of day-3's row survive; days 1-2 are gone
    val left = spark.read.parquet(s"$dir/stats").select("driver_id")
      .as[Long].collect().toSeq
    assert(left === Seq.fill(6)(3L))
    // maintenance on an unknown view is a loud error
    intercept[NoSuchElementException] {
      graft.cli.Cli.run(Seq("vacuum", cfgPath, "nope_view", "2024-01-01"), spark, _ => ())
    }
  }

  test("CLI backfill + expire-online drive the round-6 lifecycle through a repo config") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli_bf").toString
    val rows = (0 until 40).map { i =>
      (i % 8L, ts(f"2024-01-${1 + i % 20}%02d 10:00:00"), i.toDouble)
    }
    rows.toDF("driver_id", "event_timestamp", "conv_rate")
      .write.parquet(s"$dir/stats")
    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "project": "bf",
         |  "registry": "$dir/registry.json",
         |  "online_store": {"type": "parquet", "path": "$dir/store"},
         |  "entities": [
         |    {"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}
         |  ],
         |  "feature_views": [
         |    {"name": "stats", "entities": ["driver"],
         |     "features": [{"name": "conv_rate", "dtype": "DOUBLE"}],
         |     "ttl_seconds": 86400,
         |     "batch_source": {"kind": "file", "path": "$dir/stats",
         |       "format": "parquet", "event_timestamp_column": "event_timestamp",
         |       "created_timestamp_column": null, "field_mapping": {},
         |       "date_partition_column": null},
         |     "stream_source": null, "online": true}
         |  ]
         |}""".stripMargin.getBytes("UTF-8"))
    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("apply", cfgPath), spark, out.append(_))
    Cli.run(Seq("backfill", cfgPath, "2024-01-01", "2024-01-21", "7"), spark, out.append(_))
    assert(out.last.contains("backfilled 3 slice(s)"))
    // rerun: covered -> no slices
    Cli.run(Seq("backfill", cfgPath, "2024-01-01", "2024-01-21", "7"), spark, out.append(_))
    assert(out.last.contains("already covered"))
    // every key's latest event is older than ttl=1d as of Feb 1: all expire
    Cli.run(Seq("expire-online", cfgPath, "stats", "2024-02-01"), spark, out.append(_))
    assert(out.last.contains("expired 8 row(s)"))
  }

  test("CLI apply reconciles: definitions removed from the config are dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli3").toString
    Seq((7L, ts("2024-02-01 10:00:00"), 1.0))
      .toDF("driver_id", "event_timestamp", "v")
      .write.parquet(s"$dir/src.parquet")
    def cfg(views: String): String = {
      val p = s"$dir/repo.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        s"""{"project": "rec", "registry": "$dir/registry.json",
           | "online_store": {"type": "memory"},
           | "entities": [{"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}],
           | "feature_views": [$views]}""".stripMargin.getBytes("UTF-8"))
      p
    }
    def view(name: String): String =
      s"""{"name": "$name", "entities": ["driver"],
         | "features": [{"name": "v", "dtype": "DOUBLE"}], "ttl_seconds": 0,
         | "batch_source": {"kind": "file", "path": "$dir/src.parquet", "format": "parquet",
         |  "event_timestamp_column": "event_timestamp", "created_timestamp_column": null,
         |  "field_mapping": {}, "date_partition_column": null},
         | "stream_source": null, "online": true}""".stripMargin

    Cli.run(Seq("apply", cfg(s"${view("a")}, ${view("b")}")), spark, _ => ())
    val reg = new Registry(Some(s"$dir/registry.json"))
    assert(reg.listFeatureViews.map(_.name) == Seq("a", "b"))
    // drop view b from the config -> apply removes it, keeps a
    Cli.run(Seq("apply", cfg(view("a"))), spark, _ => ())
    reg.refresh()
    assert(reg.listFeatureViews.map(_.name) == Seq("a"))
    // entity still referenced by view a -> kept
    assert(reg.listEntities.map(_.name) == Seq("driver"))
  }

  test("CLI init scaffolds a repo that apply accepts; .graftignore prunes the scan") {
    val root = java.nio.file.Files.createTempDirectory("graftinit").toString
    val repo = s"$root/my_repo"
    val out = scala.collection.mutable.Buffer[String]()
    Cli.run(Seq("init", repo), spark, out.append(_))
    assert(out.last.contains("created feature repo"))
    // re-init over an existing repo -> error, never clobbers
    intercept[IllegalArgumentException](Cli.run(Seq("init", repo), spark, _ => ()))

    // the scaffold applies as a DIRECTORY: repo.json + example fragment
    Cli.run(Seq("apply", repo), spark, out.append(_))
    assert(out.last.contains("applied 1 entities, 1 feature views"))
    // and materializes end-to-end on the generated example data
    Cli.run(Seq("materialize", repo, "2024-01-01", "2024-01-07"), spark, out.append(_))
    val cfg = RepoConfig.loadRepo(repo)
    val fs = new FeatureStore(cfg.project, new Registry(Some(cfg.registryPath)),
      cfg.onlineStore, spark)
    val resp = fs.getOnlineFeatures(Seq("driver_hourly_stats:conv_rate"),
      Seq(Map[String, Any]("driver_id" -> 3L)))
    assert(resp.toMap("driver_hourly_stats:conv_rate") == Seq(3L * 0.2))

    // ignored fragments are skipped: same definitions under scratch/ and
    // *.ignored.json would be duplicate-name errors if scanned
    val example = java.nio.file.Paths.get(s"$repo/example_repo.json")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$repo/scratch"))
    java.nio.file.Files.copy(example, java.nio.file.Paths.get(s"$repo/scratch/copy.json"))
    java.nio.file.Files.copy(example, java.nio.file.Paths.get(s"$repo/wip.ignored.json"))
    Cli.run(Seq("apply", repo), spark, out.append(_))
    assert(out.last.contains("applied 1 entities, 1 feature views"))

    // an unignored duplicate IS an error (dup detection works)
    val dupPath = java.nio.file.Paths.get(s"$repo/dup.json")
    java.nio.file.Files.copy(example, dupPath)
    val e = intercept[IllegalArgumentException](Cli.run(Seq("apply", repo), spark, _ => ()))
    assert(e.getMessage.contains("duplicate"))
    java.nio.file.Files.delete(dupPath)
  }

  test("repo-config validation: single-file dups, dangling service refs, relative registry, nested repos (review r6)") {
    val dir = java.nio.file.Files.createTempDirectory("graftcfg").toString
    def write(rel: String, body: String): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/$rel")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    }
    // duplicate entity in a SINGLE file: the old in-fold check never
    // ran here and the second silently won
    write("dup.json",
      """{"project": "p", "registry": "reg.json",
        |"entities": [
        |  {"name": "e", "dtype": "INT64", "join_key": "a", "description": ""},
        |  {"name": "e", "dtype": "STRING", "join_key": "b", "description": ""}]}""".stripMargin)
    val e1 = intercept[IllegalArgumentException](RepoConfig.loadRepo(s"$dir/dup.json"))
    assert(e1.getMessage.contains("duplicate entity"))

    // a service projecting an undeclared view fails at load, not at
    // the first retrieval after an apparently-successful apply
    write("svc.json",
      """{"project": "p", "registry": "reg.json",
        |"entities": [], "feature_views": [],
        |"feature_services": [
        |  {"name": "s", "projections": [{"view": "ghost", "features": ["f"]}],
        |   "derived": []}]}""".stripMargin)
    val e2 = intercept[IllegalArgumentException](RepoConfig.loadRepo(s"$dir/svc.json"))
    assert(e2.getMessage.contains("undeclared view"))

    // relative registry resolves against the CONFIG dir, not the cwd
    write("rel/repo.json",
      """{"project": "p", "registry": "registry.json", "entities": []}""")
    val cfg = RepoConfig.loadRepo(s"$dir/rel")
    assert(cfg.registryPath == s"$dir/rel/registry.json")

    // a nested repo's subtree is a SEPARATE project, not fragments
    write("outer/repo.json",
      """{"project": "outer", "registry": "registry.json",
        |"entities": [{"name": "driver", "dtype": "INT64", "join_key": "d", "description": ""}]}""".stripMargin)
    write("outer/sub/repo.json",
      """{"project": "sub", "registry": "registry.json",
        |"entities": [{"name": "driver", "dtype": "INT64", "join_key": "d", "description": ""}]}""".stripMargin)
    write("outer/sub/defs.json",
      """{"entities": [{"name": "alien", "dtype": "INT64", "join_key": "x", "description": ""}]}""")
    val outer = RepoConfig.loadRepo(s"$dir/outer")
    assert(outer.entities.map(_.name) == Seq("driver"),
      s"nested repo leaked into the outer project: ${outer.entities.map(_.name)}")
  }

  test("CLI materialize-incremental picks up from the last interval end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli2").toString
    Seq((7L, ts("2024-02-01 10:00:00"), 1.0))
      .toDF("driver_id", "event_timestamp", "v")
      .write.parquet(s"$dir/src.parquet")
    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{"project": "e2e2", "registry": "$dir/registry.json",
         | "online_store": {"type": "parquet", "path": "$dir/store"},
         | "entities": [{"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}],
         | "feature_views": [{"name": "v", "entities": ["driver"],
         |  "features": [{"name": "v", "dtype": "DOUBLE"}], "ttl_seconds": 0,
         |  "batch_source": {"kind": "file", "path": "$dir/src.parquet", "format": "parquet",
         |   "event_timestamp_column": "event_timestamp", "created_timestamp_column": null,
         |   "field_mapping": {}, "date_partition_column": null},
         |  "stream_source": null, "online": true}]}""".stripMargin.getBytes("UTF-8"))
    Cli.run(Seq("apply", cfgPath), spark, _ => ())
    Cli.run(Seq("materialize", cfgPath, "2024-02-01", "2024-02-02"), spark, _ => ())
    Cli.run(Seq("materialize-incremental", cfgPath, "2024-02-05"), spark, _ => ())
    val reg = new Registry(Some(s"$dir/registry.json"))
    val ivs = reg.materializationIntervals("v")
    assert(ivs.size == 2 && ivs(1).start == ivs(0).end
      && ivs(1).end == ts("2024-02-05 00:00:00"))
  }

  test("CLI export: a view's source lands as TFRecord and WebDataset shards") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcli3").toString
    Seq((1L, ts("2024-02-01 10:00:00"), 0.5), (2L, ts("2024-02-01 11:00:00"), 0.7))
      .toDF("driver_id", "event_timestamp", "v")
      .write.parquet(s"$dir/src.parquet")
    val cfgPath = s"$dir/repo.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath),
      s"""{"project": "e2e3", "registry": "$dir/registry.json",
         | "online_store": {"type": "memory"},
         | "entities": [{"name": "driver", "dtype": "INT64", "join_key": "driver_id", "description": ""}],
         | "feature_views": [{"name": "v", "entities": ["driver"],
         |  "features": [{"name": "v", "dtype": "DOUBLE"}], "ttl_seconds": 0,
         |  "batch_source": {"kind": "file", "path": "$dir/src.parquet", "format": "parquet",
         |   "event_timestamp_column": "event_timestamp", "created_timestamp_column": null,
         |   "field_mapping": {}, "date_partition_column": null},
         |  "stream_source": null, "online": true}]}""".stripMargin.getBytes("UTF-8"))
    Cli.run(Seq("apply", cfgPath), spark, _ => ())
    var said = Vector.empty[String]
    Cli.run(Seq("export", cfgPath, "v", "tfrecord", s"$dir/tfr", "2"), spark, said :+= _)
    Cli.run(Seq("export", cfgPath, "v", "webdataset", s"$dir/wds", "2"), spark, said :+= _)
    assert(said.exists(_.contains("2 tfrecord")) && said.exists(_.contains("2 webdataset")))
    // both exports read back complete through the library readers
    import org.apache.spark.sql.types._
    val tfr = graft.functions.TfRecord.readShards(spark, s"$dir/tfr",
      StructType(Seq(StructField("driver_id", LongType), StructField("v", DoubleType))))
    assert(tfr.count() == 2 &&
      tfr.select("driver_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val wds = graft.functions.WebDataset.readShards(spark, s"$dir/wds", Seq("json"))
    assert(wds.count() == 2 &&
      wds.select("key").collect().map(_.getString(0)).toSet == Set("1", "2"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
