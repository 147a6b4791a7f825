package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.stores.StoreManifest
import org.apache.spark.sql.functions._

/** The versioned-store lifecycle mechanism (StoreManifest) under its
  * three load-bearing claims:
  *
  *  1. `publish` is the ONLY commit point: pending versions are
  *     invisible to `current`, half-written publishes loud-fail, and
  *     vacuum never drops a table a surviving version references
  *     (the shared append-in-place band table).
  *  2. CRASH SAFETY: a refresh killed between its store writes and
  *     `publish` leaves the old version current; the retry (a fresh
  *     managed refresh) converges to the same store state a
  *     crash-free run builds, and vacuum clears the orphan.
  *  3. The streaming ingests resolve their stores through
  *     `current` — the deployment path (SpanIngest shown; Cluster/
  *     AnnIngest share the same three-line glue, and the soak spec
  *     exercises all three families through managed stores).
  */
class StoreManifestSpec extends SparkSpec {

  test("publish is the commit point; vacuum keeps shared tables") {
    val wh = Files.createTempDirectory("graft_wh_sml").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS smlife LOCATION '$wh'")
    val mf = "smlife.manifest"
    try {
      StoreManifest.init(spark, mf)
      assert(StoreManifest.current(spark, mf, "fam").isEmpty)

      val p1 = StoreManifest.prepare(spark, mf, "fam", Seq("a", "b"))
      assert(p1.version === 1L)
      assert(StoreManifest.current(spark, mf, "fam").isEmpty,
        "a pending version must be invisible to readers")
      // half-written publish (no tables yet) loud-fails
      intercept[IllegalArgumentException] {
        StoreManifest.publish(spark, mf, "fam", p1)
      }
      Seq("a", "b").foreach(r => spark.range(1).write.mode("overwrite")
        .format("parquet").saveAsTable(p1.tables(r)))
      StoreManifest.publish(spark, mf, "fam", p1)
      assert(StoreManifest.current(spark, mf, "fam")
        === Some((1L, p1.tables)))
      intercept[IllegalArgumentException] { // double publish
        StoreManifest.publish(spark, mf, "fam", p1)
      }
      intercept[IllegalArgumentException] { // unknown version
        StoreManifest.publish(spark, mf, "fam", 9L, p1.writer)
      }

      // v2 carries role `a` forward (append-in-place reuse)
      val p2 = StoreManifest.prepare(spark, mf, "fam", Seq("a", "b"),
        reuse = Map("a" -> p1.tables("a")))
      assert(p2.tables("a") === p1.tables("a"))
      spark.range(2).write.mode("overwrite").format("parquet")
        .saveAsTable(p2.tables("b"))
      StoreManifest.publish(spark, mf, "fam", p2)
      assert(StoreManifest.currentRequired(spark, mf, "fam")._1 === 2L)

      val dropped = StoreManifest.vacuum(spark, mf, "fam")
      assert(dropped === Seq(p1.tables("b")),
        s"vacuum must drop only v1's unshared table, got $dropped")
      assert(spark.catalog.tableExists(p1.tables("a")),
        "the table shared with the live version must survive vacuum")
      assert(!spark.catalog.tableExists(p1.tables("b")))
      val statuses = StoreManifest.statusReport(spark, mf)
        .filter(col("family") === "fam")
        .select(col("version"), col("status")).distinct()
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(statuses === Map(1L -> "vacuumed", 2L -> "live"))
    } finally spark.sql("DROP DATABASE IF EXISTS smlife CASCADE")
  }

  test("snapshot reads: at(v) pins a retired version until vacuum, then fails loudly") {
    val wh = Files.createTempDirectory("graft_wh_smat").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS smat LOCATION '$wh'")
    val mf = "smat.manifest"
    try {
      StoreManifest.init(spark, mf)
      val p1 = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      spark.range(10).write.mode("overwrite").format("parquet")
        .saveAsTable(p1.tables("t"))
      StoreManifest.publish(spark, mf, "fam", p1)
      val p2 = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      spark.range(20).write.mode("overwrite").format("parquet")
        .saveAsTable(p2.tables("t"))
      StoreManifest.publish(spark, mf, "fam", p2)

      // the pin resolves the RETIRED version's physical table and a
      // snapshot read reproduces v1's data after v2 went live
      val pinned = StoreManifest.at(spark, mf, "fam", 1L)
      assert(pinned === p1.tables)
      assert(spark.table(pinned("t")).count() === 10L,
        "a reader pinned to v1 must still see v1's rows")
      assert(StoreManifest.at(spark, mf, "fam", 2L) === p2.tables)

      // a pending version is not snapshot-readable
      val p3 = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      val exPend = intercept[IllegalArgumentException] {
        StoreManifest.at(spark, mf, "fam", p3.version)
      }
      assert(exPend.getMessage.contains("pending"))

      // vacuum retires the pin LOUDLY — no silent fallback to live
      StoreManifest.vacuum(spark, mf, "fam")
      val exVac = intercept[IllegalArgumentException] {
        StoreManifest.at(spark, mf, "fam", 1L)
      }
      assert(exVac.getMessage.contains("vacuumed"))
    } finally spark.sql("DROP DATABASE IF EXISTS smat CASCADE")
  }

  test("two-writer interleaves fail loudly at publish (round-10 verdict item)") {
    val wh = Files.createTempDirectory("graft_wh_sm2w").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS sm2w LOCATION '$wh'")
    val mf = "sm2w.manifest"
    try {
      import spark.implicits._
      StoreManifest.init(spark, mf)
      val p1 = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      spark.range(1).write.format("parquet").saveAsTable(p1.tables("t"))
      StoreManifest.publish(spark, mf, "fam", p1)

      // STALE SNAPSHOT: writer A prepares v2, writer B prepares v3
      // and publishes first; A's publish must refuse (its refresh was
      // computed off a superseded live version) instead of silently
      // creating a born-retired v2.
      val a = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      val b = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      spark.range(2).write.format("parquet").saveAsTable(b.tables("t"))
      StoreManifest.publish(spark, mf, "fam", b)
      spark.range(3).write.format("parquet").saveAsTable(a.tables("t"))
      val e1 = intercept[IllegalArgumentException] {
        StoreManifest.publish(spark, mf, "fam", a)
      }
      assert(e1.getMessage.contains("stale"), e1.getMessage)
      assert(StoreManifest.currentRequired(spark, mf, "fam")._1
        === b.version, "the loser must not disturb the live version")

      // VERSION-ALLOCATION COLLISION: writer C prepares v4; a racing
      // writer whose max-version read happened before C's append
      // lands prepared rows for the SAME version. C's publish (and
      // symmetrically the racer's) must refuse — blessing the version
      // would publish tables the other writer half-wrote.
      val c = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      Seq(("fam", c.version, "t", "sm2w.racer_table", "prepared", "racer-nonce",
        new java.sql.Timestamp(0L)))
        .toDF("family", "version", "role", "table_name", "event", "writer",
          "ts")
        .write.mode("append").format("parquet").saveAsTable(mf)
      spark.range(4).write.format("parquet").saveAsTable(c.tables("t"))
      val e2 = intercept[IllegalArgumentException] {
        StoreManifest.publish(spark, mf, "fam", c)
      }
      assert(e2.getMessage.contains("another writer"), e2.getMessage)
      assert(StoreManifest.currentRequired(spark, mf, "fam")._1
        === b.version, "a collided version must never go live")
      // the retry path converges: a fresh prepare allocates PAST the
      // collided version and publishes cleanly
      val retry = StoreManifest.prepare(spark, mf, "fam", Seq("t"))
      assert(retry.version > c.version)
      spark.range(5).write.format("parquet").saveAsTable(retry.tables("t"))
      StoreManifest.publish(spark, mf, "fam", retry)
      assert(StoreManifest.currentRequired(spark, mf, "fam")._1
        === retry.version)
    } finally spark.sql("DROP DATABASE IF EXISTS sm2w CASCADE")
  }

  test("vocabulary store: manifest glue, replay guard, train-off-store equivalence") {
    val wh = Files.createTempDirectory("graft_wh_voc").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS vocstore LOCATION '$wh'")
    val mf = "vocstore.manifest"
    try {
      import graft.operators.Bpe
      val docs = Tables(spark, sf001, "documents")
        .select(col("doc_id"), col("text"))
      StoreManifest.publishVocab(spark, mf, sf001, buckets = 8)

      // fold an installment of brand-new docs; replay is a quiet no-op
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      assert(StoreManifest.refreshVocab(spark, mf, batch, 1L))
      assert(!StoreManifest.refreshVocab(spark, mf, batch, 1L),
        "replayed installment must be refused")

      // sum-on-read equals a one-shot recount of the union corpus
      val corpus = docs.unionByName(batch)
      val recount = corpus
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0 && !col("w").contains("~"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val (_, cur) = StoreManifest.currentRequired(spark, mf, "vocab")
      val stored = Bpe.readVocabStore(spark, cur("words"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(stored === recount,
        "vocab store sum-on-read must equal the one-shot recount")

      // training off the store == training off the live corpus
      def report(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).sortBy(_._1).toSeq
      assert(report(StoreManifest.trainBpe(spark, mf, 12))
        === report(Bpe.mergesHybrid(corpus, 12)),
        "store-trained merges must equal corpus-trained merges")

      // non-monotone novel id throws (checkpoint-reset shape)
      assert(StoreManifest.refreshVocab(spark, mf, batch.limit(1), 3L))
      intercept[IllegalArgumentException] {
        StoreManifest.refreshVocab(spark, mf, batch, 2L)
      }

      // compaction: one summed row per word, counts preserved, the
      // replay watermark carried (batch 3 still refused after)
      StoreManifest.compactVocab(spark, mf)
      val (_, cur2) = StoreManifest.currentRequired(spark, mf, "vocab")
      assert(cur2("words") !== cur("words"), "compaction rolls forward")
      val compacted = Bpe.readVocabStore(spark, cur2("words"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = Bpe.readVocabStore(spark, cur("words"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(compacted === expected,
        "compaction must preserve summed counts")
      assert(!StoreManifest.refreshVocab(spark, mf, batch.limit(1), 3L),
        "the replay watermark must survive compaction")
    } finally spark.sql("DROP DATABASE IF EXISTS vocstore CASCADE")
  }

  test("kill between store write and publish: old version current, retry converges") {
    val wh = Files.createTempDirectory("graft_wh_smc").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS smcrash LOCATION '$wh'")
    val mf = "smcrash.manifest"
    try {
      val p1 = StoreManifest.publishDedup(spark, mf, sf001, buckets = 8)
      val (v1, cur1) = StoreManifest.currentRequired(spark, mf, "dedup")
      assert(v1 === 1L)

      // a batch of genuinely new docs: clones of an sf slice under
      // fresh ids (they near-dup-join the stored clusters)
      def batch = Tables(spark, sf001, "documents")
        .filter(col("doc_id") % 11 === 5)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .select(col("doc_id"), col("text"))

      // CRASHED refresh: all store writes complete, then the process
      // dies before publish — exactly refreshDedup minus its last line
      val pc = StoreManifest.prepare(spark, mf, "dedup", Seq("band", "comp"),
        reuse = Map("band" -> cur1("band")))
      Dedup.refreshStores(spark, batch, cur1("band"), cur1("comp"),
        pc.tables("comp"))
      // ---- crash here ----
      assert(StoreManifest.currentRequired(spark, mf, "dedup")
        === ((v1, cur1)),
        "a crash before publish must leave the old version current")

      // RETRY: the deployment's recovery is simply a fresh managed
      // refresh of the same batch (the crashed append left the batch's
      // band rows in the shared table — the documented replay case
      // compaction cleans; labels must still converge)
      val p2 = StoreManifest.refreshDedup(spark, mf, batch)
      val (v2, cur2) = StoreManifest.currentRequired(spark, mf, "dedup")
      assert(v2 === p2.version && cur2("comp") === p2.tables("comp"))

      // convergence: equal to a crash-free control run
      Dedup.writeBandStore(spark, sf001, "smcrash.ctrl_band", buckets = 8)
      Dedup.writeComponentsStore(spark, sf001, "smcrash.ctrl_comp",
        buckets = 8)
      Dedup.refreshStores(spark, batch, "smcrash.ctrl_band",
        "smcrash.ctrl_comp", "smcrash.ctrl_comp2")
      val got = spark.table(cur2("comp")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.table("smcrash.ctrl_comp2").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        "retried refresh must converge to the crash-free component store")
      val gotBands = spark.table(cur2("band")).distinct().count()
      val wantBands = spark.table("smcrash.ctrl_band").distinct().count()
      assert(gotBands === wantBands,
        "band facts must agree up to the replayed-append duplicates")

      // vacuum clears the orphaned crash attempt and the retired v1
      val dropped = StoreManifest.vacuum(spark, mf, "dedup")
      assert(dropped.toSet === Set(pc.tables("comp"), cur1("comp")),
        s"expected the orphan + retired comp tables dropped, got $dropped")
      assert(spark.catalog.tableExists(cur2("band"))
        && spark.catalog.tableExists(cur2("comp")))
    } finally spark.sql("DROP DATABASE IF EXISTS smcrash CASCADE")
  }

  test("kill INSIDE the store writes (band landed, comp failed): retry converges") {
    val wh = Files.createTempDirectory("graft_wh_smm").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS smmid LOCATION '$wh'")
    val mf = "smmid.manifest"
    try {
      StoreManifest.publishDedup(spark, mf, sf001, buckets = 8)
      val (v1, cur1) = StoreManifest.currentRequired(spark, mf, "dedup")
      def batch = Tables(spark, sf001, "documents")
        .filter(col("doc_id") % 13 === 4)
        .withColumn("doc_id", col("doc_id") + 3000000L)
        .select(col("doc_id"), col("text"))

      // refreshStores writes the band append FIRST, then the comp
      // roll-forward — pointing the comp target at a nonexistent
      // database makes the refresh die exactly between the two, the
      // messiest crash point (delta facts landed, no new version)
      StoreManifest.prepare(spark, mf, "dedup", Seq("band", "comp"),
        reuse = Map("band" -> cur1("band")))
      intercept[Exception] {
        Dedup.refreshStores(spark, batch, cur1("band"), cur1("comp"),
          "no_such_db.comp")
      }
      assert(StoreManifest.currentRequired(spark, mf, "dedup")
        === ((v1, cur1)),
        "a mid-write crash must leave the old version current")

      // retry of the SAME batch; convergence vs a crash-free control
      StoreManifest.refreshDedup(spark, mf, batch)
      val (_, cur2) = StoreManifest.currentRequired(spark, mf, "dedup")
      Dedup.writeBandStore(spark, sf001, "smmid.ctrl_band", buckets = 8)
      Dedup.writeComponentsStore(spark, sf001, "smmid.ctrl_comp",
        buckets = 8)
      Dedup.refreshStores(spark, batch, "smmid.ctrl_band",
        "smmid.ctrl_comp", "smmid.ctrl_comp2")
      val got = spark.table(cur2("comp")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.table("smmid.ctrl_comp2").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        "retry after a mid-write crash must converge to the control")
      assert(spark.table(cur2("band")).distinct().count()
        === spark.table("smmid.ctrl_band").distinct().count(),
        "band facts agree up to the replayed-append duplicates")
    } finally spark.sql("DROP DATABASE IF EXISTS smmid CASCADE")
  }

  test("SpanIngest resolves the gram store via the manifest") {
    val wh = Files.createTempDirectory("graft_wh_smi").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS smspan LOCATION '$wh'")
    val mf = "smspan.manifest"
    try {
      import spark.implicits._
      StoreManifest.publishGrams(spark, mf, sf001, buckets = 8)
      val srcText = Tables(spark, sf001, "documents")
        .filter(col("doc_id") === 0L).select(col("text")).head().getString(0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val ctx = spark.sqlContext
      val docs = MemoryStream[(Long, String)]
      val outDir = Files.createTempDirectory("smi_out").toString
      val ckpt = Files.createTempDirectory("smi_ckpt").toString
      val q = graft.streaming.SpanIngest.startFromManifest(
        docs.toDF().toDF("doc_id", "text"), mf, outDir, ckpt)
      docs.addData((2000000L, srcText),
        (2000001L, "zq zq unique words never in corpus a b c d e f g h"))
      q.processAllAvailable(); q.stop()
      val got = graft.streaming.SpanIngest.readCoverage(spark, outDir)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(got(2000000L) === 1.0,
        s"store clone must be fully covered through the manifest: $got")
      assert(got(2000001L) === 0.0, s"novel text uncovered: $got")

      // the strip deployment resolves through the same manifest
      val docs2 = MemoryStream[(Long, String)]
      val outDir2 = Files.createTempDirectory("smi_out2").toString
      val ckpt2 = Files.createTempDirectory("smi_ckpt2").toString
      val q2 = graft.streaming.SpanIngest.startWithStripFromManifest(
        docs2.toDF().toDF("doc_id", "text"), mf, outDir2, ckpt2)
      docs2.addData((2000002L, srcText))
      q2.processAllAvailable(); q2.stop()
      val stripped = graft.streaming.SpanIngest.readStripped(spark, outDir2)
        .collect().map(r => (r.getLong(4), r.getString(5))).head
      assert(stripped === ((0L, "")),
        s"manifest-resolved strip must empty the stored clone: $stripped")
    } finally spark.sql("DROP DATABASE IF EXISTS smspan CASCADE")
  }

  test("init migrates a pre-writer-column manifest; rejects unknown schemas") {
    val wh = Files.createTempDirectory("graft_wh_smm").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS smmig LOCATION '$wh'")
    try {
      import spark.implicits._
      // a manifest created BEFORE the writer column existed: 6 cols.
      // CREATE IF NOT EXISTS would silently keep it, the next append
      // would schema-mismatch and publish's positional reads would
      // address the wrong fields (round-12 advice fix).
      val old = "smmig.oldmf"
      val ts = new java.sql.Timestamp(1000L)
      Seq(("fam", 1L, "a", "smmig.oldmf_fam_v1_a", "prepared", ts),
          ("fam", 1L, "a", "smmig.oldmf_fam_v1_a", "published", ts))
        .toDF("family", "version", "role", "table_name", "event", "ts")
        .write.format("parquet").saveAsTable(old)
      StoreManifest.init(spark, old)
      assert(spark.table(old).columns.toSeq ===
        Seq("family", "version", "role", "table_name", "event", "writer",
          "ts"), "init must roll the old manifest forward to 7 columns")
      assert(spark.table(old).filter(col("writer") =!= "").count() === 0,
        "historical events migrate with the pre-nonce empty writer")
      // the migrated manifest works end-to-end: history intact, a new
      // prepare/publish cycle lands on top of it
      spark.range(1).write.mode("overwrite").format("parquet")
        .saveAsTable("smmig.oldmf_fam_v1_a")
      val p = StoreManifest.prepare(spark, old, "fam", Seq("a"))
      assert(p.version === 2L, "migrated history must drive versioning")
      spark.range(2).write.mode("overwrite").format("parquet")
        .saveAsTable(p.tables("a"))
      StoreManifest.publish(spark, old, "fam", p)
      assert(StoreManifest.currentRequired(spark, old, "fam")._1 === 2L)

      // ---- crash windows of the roll-forward migration (round 13) ----
      // window A: crash AFTER the backup snapshot, BEFORE the rewrite
      // — manifest still 6-col, backup present; init re-migrates
      val crashA = "smmig.crasha"
      Seq(("fam", 1L, "a", "smmig.crasha_t", "published", ts))
        .toDF("family", "version", "role", "table_name", "event", "ts")
        .write.format("parquet").saveAsTable(crashA)
      spark.table(crashA).write.format("parquet")
        .saveAsTable(crashA + "__migrating")
      StoreManifest.init(spark, crashA)
      assert(spark.table(crashA).columns.toSeq.contains("writer"))
      assert(spark.table(crashA).count() === 1L)
      assert(!spark.catalog.tableExists(crashA + "__migrating"),
        "a completed migration must drop its backup")
      // window B: crash MID-REWRITE — the manifest table is GONE
      // (mode(overwrite) drops before writing), only the backup
      // survives; before the fix this lost the entire event log
      val crashB = "smmig.crashb"
      Seq(("fam", 3L, "a", "smmig.crashb_t", "published", ts))
        .toDF("family", "version", "role", "table_name", "event", "ts")
        .write.format("parquet").saveAsTable(crashB + "__migrating")
      StoreManifest.init(spark, crashB)
      assert(spark.table(crashB).count() === 1L,
        "init must restore the event log from the migration backup")
      assert(spark.table(crashB).head().getLong(1) === 3L)
      assert(!spark.catalog.tableExists(crashB + "__migrating"))

      // anything OTHER than the known 6-column shape loud-fails
      val alien = "smmig.alienmf"
      Seq(("x", 1L)).toDF("family", "version")
        .write.format("parquet").saveAsTable(alien)
      val e = intercept[IllegalStateException] {
        StoreManifest.init(spark, alien)
      }
      assert(e.getMessage.contains("rebuild the manifest"))

      // ---- stale backup DIRECTORY, no catalog entry (round-13 advice) ----
      // a killed run whose in-memory catalog died with its JVM leaves
      // the backup's warehouse directory behind; before the fix the
      // next migration's saveAsTable(backup) failed with
      // LOCATION_ALREADY_EXISTS. Window C: COMMITTED stale backup
      // (_SUCCESS present) — authoritative, init restores from it.
      val crashC = "smmig.crashc"
      val cPath = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser
            .parseTableIdentifier(crashC + "__migrating")))
      val fs = cPath.getFileSystem(spark.sessionState.newHadoopConf())
      // the directory exists WITHOUT a catalog entry — written straight
      // to the default table path, the exact state a dead in-memory
      // catalog leaves behind (a committed write carries _SUCCESS)
      Seq(("fam", 7L, "a", "smmig.crashc_t", "published", ts))
        .toDF("family", "version", "role", "table_name", "event", "ts")
        .write.format("parquet").save(cPath.toString)
      assert(fs.exists(new org.apache.hadoop.fs.Path(cPath, "_SUCCESS")))
      assert(!spark.catalog.tableExists(crashC + "__migrating"))
      StoreManifest.init(spark, crashC)
      assert(spark.table(crashC).count() === 1L,
        "a committed catalog-less backup dir is the authoritative log")
      assert(spark.table(crashC).head().getLong(1) === 7L)
      assert(!fs.exists(cPath), "the stale directory must be swept")
      // window D: PARTIAL stale backup (no _SUCCESS — the write
      // itself died, the manifest was never touched) — swept, and the
      // next migration's backup write finds a clean location
      val crashD = "smmig.crashd"
      Seq(("fam", 1L, "a", "smmig.crashd_t", "published", ts))
        .toDF("family", "version", "role", "table_name", "event", "ts")
        .write.format("parquet").saveAsTable(crashD) // 6-col: migration due
      val dPath = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser
            .parseTableIdentifier(crashD + "__migrating")))
      fs.mkdirs(dPath)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(dPath, "part-00000.parquet"))
      out.write(Array[Byte](1, 2, 3)); out.close() // torn write, no marker
      StoreManifest.init(spark, crashD)
      assert(spark.table(crashD).columns.toSeq.contains("writer"),
        "the due migration must proceed over the swept partial dir")
      assert(spark.table(crashD).count() === 1L)
      assert(!spark.catalog.tableExists(crashD + "__migrating"))
      // window E (round-14 advice): READABLE part-files, NO marker —
      // the state a markerless committer
      // (marksuccessfuljobs=false) leaves for a COMMITTED backup, and
      // a mid-snapshot crash leaves for a partial one. Ambiguous from
      // files alone and both guesses can lose the version history, so
      // init must refuse loudly and delete NOTHING.
      val crashE = "smmig.crashe"
      val ePath = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser
            .parseTableIdentifier(crashE + "__migrating")))
      Seq(("fam", 9L, "a", "smmig.crashe_t", "published", ts))
        .toDF("family", "version", "role", "table_name", "event", "ts")
        .write.format("parquet").save(ePath.toString)
      fs.delete(new org.apache.hadoop.fs.Path(ePath, "_SUCCESS"), false)
      val eErr = intercept[IllegalStateException] {
        StoreManifest.init(spark, crashE)
      }
      assert(eErr.getMessage.contains("no _SUCCESS marker"))
      assert(fs.exists(ePath), "refusal must not sweep the directory")
      assert(fs.listStatus(ePath).exists(_.getPath.getName.startsWith("part-")),
        "refusal must leave the part-files untouched")
      // the operator resolution named in the error works: marking the
      // directory committed lets init restore it as the authoritative log
      fs.create(new org.apache.hadoop.fs.Path(ePath, "_SUCCESS")).close()
      StoreManifest.init(spark, crashE)
      assert(spark.table(crashE).count() === 1L)
      assert(spark.table(crashE).head().getLong(1) === 9L)
      assert(!fs.exists(ePath), "restored backup dir is then swept")
    } finally spark.sql("DROP DATABASE IF EXISTS smmig CASCADE")
  }

  test("relabelWetNear: post-relabel comps equal a from-scratch closure of the stored band graph") {
    val wh = Files.createTempDirectory("graft_wh_rwn").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS rwn LOCATION '$wh'")
    try {
      import spark.implicits._
      val mf = "rwn.mf"
      StoreManifest.publishWetNear(spark, mf, buckets = 4)
      def gzWet(docs: Seq[(Long, String)], fileId: Long) =
        Seq((fileId, docs.toArray.flatMap { case (i, t) =>
          graft.operators.Multimodal.gzipBytes(
            (s"https://s${i % 3}.example.org/p$i\r\n\r\n" + t)
              .getBytes("UTF-8"))
        })).toDF("file_id", "payload")
      def txt(i: Long): String =
        (0 until 30).map(w => s"v${(i * 37 + w * 11) % 500} u$w")
          .mkString(" ")
      // two real waves through the seam (near-dups in wave 2)
      assert(StoreManifest.refreshWetNear(spark, mf,
        gzWet(Seq((1L, txt(1)), (2L, txt(2)), (3L, txt(3))), 1L), 10, 1L))
      assert(StoreManifest.refreshWetNear(spark, mf,
        gzWet(Seq((4L, txt(1).dropRight(2) + "z9"), (5L, txt(3) + " q")),
          2L), 10, 2L))
      // a crafted cluster MERGE — the state streaming assignment
      // cannot relabel: docs 10 and 20 stored in separate clusters,
      // doc 30 later collides with BOTH bands; assignment labels 30
      // into min(10, 20) = 10 and leaves 20's stored label stale
      val cur = StoreManifest.currentRequired(spark, mf, "wetnear")._2
      import graft.stores.DeltaStore
      assert(DeltaStore.refresh(spark,
        Seq((0, 101L, 101L, 10L), (1, 202L, 202L, 20L))
          .toDF("band", "h1", "h2", "doc_id"),
        cur("bands"), Seq("band", "h1", "h2"), 3L))
      assert(DeltaStore.refresh(spark,
        Seq((10L, 10L), (20L, 20L)).toDF("doc_id", "comp"),
        cur("comps"), Seq("doc_id"), 3L))
      assert(DeltaStore.refresh(spark,
        Seq((0, 101L, 101L, 30L), (1, 202L, 202L, 30L))
          .toDF("band", "h1", "h2", "doc_id"),
        cur("bands"), Seq("band", "h1", "h2"), 4L))
      assert(DeltaStore.refresh(spark,
        Seq((30L, 10L)).toDF("doc_id", "comp"),
        cur("comps"), Seq("doc_id"), 4L))
      val stale = spark.table(cur("comps"))
        .filter(col("doc_id") === 20L).head().getLong(1)
      assert(stale === 20L, "pre-relabel: 20's label is the stale one")

      StoreManifest.relabelWetNear(spark, mf)
      val cur2 = StoreManifest.currentRequired(spark, mf, "wetnear")._2
      assert(cur2("bands") === cur("bands"),
        "the band role is append-in-place — reused, not copied")
      assert(cur2("comps") !== cur("comps"),
        "the comps role rolls forward to a new table")

      // from-scratch reference: sequential union-find over the FULL
      // stored band graph, labels = min doc id per component
      val bandRows = spark.table(cur2("bands"))
        .select(col("band"), col("h1"), col("h2"), col("doc_id"))
        .collect().map(r => ((r.getInt(0), r.getLong(1), r.getLong(2)),
          r.getLong(3)))
      val ids = spark.table(cur("comps")).select(col("doc_id"))
        .collect().map(_.getLong(0)).distinct
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      bandRows.groupBy(_._1).values.foreach { g =>
        val ms = g.map(_._2); ms.tail.foreach(union(ms.head, _))
      }
      val want = ids.map(i => i -> find(i)).toMap
      val got = spark.table(cur2("comps"))
        .select(col("doc_id"), col("comp")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        "relabel must equal a from-scratch closure of the band graph")
      assert(got(20L) === 10L, "the stale merge is healed")
      // the replay watermark rode the roll: the last pre-relabel
      // installment stays refused on the new table
      assert(!DeltaStore.refresh(spark,
        Seq((99L, 99L)).toDF("doc_id", "comp"),
        cur2("comps"), Seq("doc_id"), 4L),
        "a pre-relabel installment id must stay refused after the roll")
    } finally spark.sql("DROP DATABASE IF EXISTS rwn CASCADE")
  }
}
