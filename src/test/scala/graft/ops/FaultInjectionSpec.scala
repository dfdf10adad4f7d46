package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** MID-COMMIT fault injection over the composed dedup pipeline: a
  * fault-injecting [[graft.meta.FileIO]] kills the driver at the Nth
  * metadata mutation (manifest publish / slot replace — the exact commit
  * points of the protocol), sweeping N across EVERY commit of every
  * window of the full loop (probe → pairs-append → extend → fold →
  * keep-merge → curation → tag moves). After each induced crash the
  * operator's documented recovery — re-run the crashed window — must
  * converge the pair log, membership, keep-list and drop list to the
  * one-shot batch answer. Run under BOTH FileIO impls, so the POSIX
  * rename protocol and the object-store conditional-PUT emulation face
  * the same torn-commit points. */
class FaultInjectionSpec extends SparkSuite {
  import spark.implicits._

  private class InjectedCrash extends RuntimeException("injected crash")

  /** Counts mutating FileIO calls and throws at the armed one — a crash
    * immediately BEFORE that metadata mutation lands, i.e. between two
    * commits. Sweeping the kill index therefore visits every
    * inter-commit crash point of the sequence (data-file writes are
    * write-once and not behind the seam; losing them is equivalent to
    * crashing before the manifest commit that would have published
    * them). Locks and link/copy are not commit points. */
  private class KillingFileIO(inner: graft.meta.FileIO)
      extends graft.meta.FileIO {
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var killAt: Int = -1
    private def tick(): Unit =
      if (killAt >= 0 && count.incrementAndGet() == killAt)
        throw new InjectedCrash
    override def replaceSlot(tmp: java.nio.file.Path,
        target: java.nio.file.Path): Unit = {
      tick(); inner.replaceSlot(tmp, target)
    }
    override def publishNew(tmp: java.nio.file.Path,
        target: java.nio.file.Path): Boolean = {
      tick(); inner.publishNew(tmp, target)
    }
    override def withFileLock[T](lockFile: java.nio.file.Path)(
        body: => T): T = inner.withFileLock(lockFile)(body)
    override def linkOrCopy(src: java.nio.file.Path,
        dst: java.nio.file.Path): Unit = inner.linkOrCopy(src, dst)
  }

  private def isInjected(t: Throwable): Boolean = {
    var c = t
    while (c != null) {
      if (c.isInstanceOf[InjectedCrash]) return true
      c = c.getCause
    }
    false
  }

  test("every inter-commit crash point of the composed loop replays to " +
      "the one-shot answer (pairs-append / extend / fold / keep-merge / " +
      "curation / tag-move seams, both FileIO impls)") {
    val base = (0 until 31).map(i => s"w$i").mkString(" ")
    val docs = Map(1L -> base, 2L -> (base + " aa"),
      3L -> (base + " bb"), 4L -> (base + " zz"))
    val windows = Seq(Seq(1L, 2L), Seq(3L, 4L))
    // ground truth, computed once with no injection
    val oneShotPairs = DedupOps.minhashLshPairs(
      docs.toSeq.map { case (i, t) => (i, t) }.toDF("doc_id", "text"),
      "doc_id", "text")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().sorted.toSeq
    val oneShotCC = ClusterOps.connectedComponentsAltStar(
      oneShotPairs.toDF("a", "b"), "a", "b")
      .select($"node", $"cluster").as[(Long, Long)].collect().sorted.toSeq
    underEachFileIO { fio =>
      val killer = new KillingFileIO(graft.meta.FileIO.impl)
      val prev = graft.meta.FileIO.impl
      graft.meta.FileIO.impl = killer
      try {
        var killPoint = 1
        var sawClean = false
        var runs = 0
        while (!sawClean) {
          runs += 1
          val wh = java.nio.file.Files
            .createTempDirectory(s"fault_${fio}_$killPoint").toString
          val idx = s"$wh/idx"; val pairsP = s"$wh/pairs"
          val st = s"$wh/state"; val kp = s"$wh/keep"
          val dropP = s"$wh/drops"
          // index build is fixture setup, not a seam under test
          killer.killAt = -1
          DedupOps.minhashLshIndexBuild(
            Seq.empty[(Long, String)].toDF("doc_id", "text"),
            "doc_id", "text", idx)
          def window(w: Int): Unit = {
            DedupOps.minhashLshIndexProbe(spark,
              windows(w).map(i => (i, docs(i))).toDF("doc_id", "text"),
              "doc_id", "text", idx,
              pairsSink = Some((pairsP, w.toLong))).collect()
            ClusterOps.componentsCycle(spark, pairsP, "f_cur", st,
              keepPath = Some(kp))
            ClusterOps.curationCycle(spark, st, "f_drop", kp, dropP)
            ()
          }
          // arm the Nth commit of the WHOLE run; crash at most once
          killer.count.set(0)
          killer.killAt = killPoint
          var crashedAt = -1
          windows.indices.foreach { w =>
            if (crashedAt < 0) {
              try window(w)
              catch {
                case t: Throwable if isInjected(t) =>
                  crashedAt = w
                  killer.killAt = -1 // "restart": injection disarmed
              }
            }
          }
          killer.killAt = -1
          if (crashedAt < 0) sawClean = true // past the last commit: done
          else // the recovery contract: re-run from the crashed window
            (crashedAt until windows.size).foreach(window)
          // invariants hold after EVERY run, crashed-and-replayed or clean
          val logged = graft.api.Collection(spark, pairsP).toDF()
            .select($"doc_a", $"doc_b").as[(Long, Long)]
            .collect().sorted.toSeq
          assert(logged == oneShotPairs,
            s"[$fio kill=$killPoint] pair log diverged: $logged")
          val members = ClusterOps.components(spark, st)
            .as[(Long, Long)].collect().sorted.toSeq
          assert(members == oneShotCC,
            s"[$fio kill=$killPoint] membership diverged: $members")
          val mat = ClusterOps.keepListMaterialized(spark, kp)
            .as[(Long, Long, Long)].collect().sorted.toSeq
          val readSide = ClusterOps.keepList(spark, st)
            .as[(Long, Long, Long)].collect().sorted.toSeq
          assert(mat == readSide,
            s"[$fio kill=$killPoint] keep-list diverged: $mat vs $readSide")
          val drops = ClusterOps.dropList(spark, dropP)
            .select($"doc_id").as[Long].collect().sorted.toSeq
          val expectDrops = oneShotCC.filter { case (d, c) => d != c }
            .map(_._1).sorted
          assert(drops == expectDrops,
            s"[$fio kill=$killPoint] drop list diverged: $drops")
          killPoint += 1
        }
        info(s"[$fio] swept ${killPoint - 1} commit points in $runs runs")
        assert(killPoint > 10,
          s"[$fio] suspiciously few commit points (${killPoint - 1}) — " +
            "did the seam stop routing through FileIO?")
      } finally graft.meta.FileIO.impl = prev
    }
  }

  test("every inter-commit crash point of a rollup consumer cycle " +
      "replays exactly-once (MERGE + applied-version stamp + tag-move " +
      "seams, both FileIO impls, zero protocol breaks)") {
    underEachFileIO { fio =>
      val killer = new KillingFileIO(graft.meta.FileIO.impl)
      val prev = graft.meta.FileIO.impl
      graft.meta.FileIO.impl = killer
      try {
        var killPoint = 1
        var sawClean = false
        while (!sawClean) {
          // catalog instances cache per NAME — every run needs its own
          val cat = s"fir${fio.take(3)}k$killPoint"
          val wh = java.nio.file.Files
            .createTempDirectory(s"${cat}_wh").toString
          spark.conf.set(s"spark.sql.catalog.$cat",
            classOf[graft.spark.HadroCatalog].getName)
          spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
          spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
          val factDir = s"$wh/db/f"; val aggDir = s"$wh/db/agg"
          killer.killAt = -1 // fixture: producer + bootstrap, no kills
          Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
            .write.format("hadro").mode("overwrite").save(factDir)
          graft.api.IncrementalRollup.bootstrap(spark, factDir,
            "fir_cur", aggDir, "g", Seq("v" -> "sv"))
          Seq((3L, "a", 5.0), (4L, "c", 7.0)).toDF("k", "g", "v")
            .write.format("hadro").mode("append").save(factDir)
          // the consumer cycle under a single armed kill
          killer.count.set(0)
          killer.killAt = killPoint
          val crashed =
            try { graft.api.IncrementalRollup.cycle(spark, factDir,
              "fir_cur", s"$cat.db.agg", "g", Seq("v" -> "sv")); false }
            catch { case t: Throwable if isInjected(t) => true }
          killer.killAt = -1
          if (!crashed) sawClean = true
          else graft.api.IncrementalRollup.cycle(spark, factDir,
            "fir_cur", s"$cat.db.agg", "g", Seq("v" -> "sv")) // retry
          val got = graft.api.Collection(spark, aggDir).toDF()
            .select($"g", $"n", $"sv".cast("double"))
            .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
          assert(got == Seq(("a", 2L, 15.0), ("b", 1L, 20.0),
            ("c", 1L, 7.0)),
            s"[$fio kill=$killPoint] rollup diverged: $got")
          assert(graft.api.IncrementalRollup.protocolBreaks(
            java.nio.file.Paths.get(aggDir)) == 0L,
            s"[$fio kill=$killPoint] protocol break recorded on a " +
              "healthy crash-replay")
          spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
          spark.conf.unset(s"spark.sql.catalog.$cat")
          killPoint += 1
        }
        info(s"[$fio] swept ${killPoint - 1} rollup-cycle commit points")
        assert(killPoint > 3,
          s"[$fio] suspiciously few commit points (${killPoint - 1})")
      } finally graft.meta.FileIO.impl = prev
    }
  }

  test("every inter-commit crash point of cycleKeyed and cycleRefresh " +
      "replays exactly-once (typed-delta MERGE and partial-recompute " +
      "MERGE share the stamp protocol)") {
    // one FileIO impl suffices here: the stamp/tag protocol itself is
    // already swept under both by the plain-cycle test; this pins the
    // KEYED delta classification and the MIN/MAX partial recompute
    // against the same crash points
    val killer = new KillingFileIO(graft.meta.FileIO.impl)
    val prev = graft.meta.FileIO.impl
    graft.meta.FileIO.impl = killer
    try {
      Seq("keyed", "refresh").foreach { mode =>
        var killPoint = 1
        var sawClean = false
        while (!sawClean) {
          val cat = s"f$mode$killPoint"
          val wh = java.nio.file.Files
            .createTempDirectory(s"${cat}_wh").toString
          spark.conf.set(s"spark.sql.catalog.$cat",
            classOf[graft.spark.HadroCatalog].getName)
          spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
          spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
          val factDir = s"$wh/db/f"; val aggDir = s"$wh/db/agg"
          killer.killAt = -1
          Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
            .toDF("k", "g", "v")
            .write.format("hadro").mode("overwrite")
            .option("hadro.key", "k").save(factDir)
          val fact = graft.api.Collection(spark, factDir)
          if (mode == "keyed")
            graft.api.IncrementalRollup.bootstrap(spark, factDir,
              "f_cur", aggDir, "g", Seq("v" -> "sv"))
          else
            graft.api.IncrementalRollup.bootstrapRefresh(spark, factDir,
              "f_cur", aggDir, "g", Seq(("max", "v", "mv")))
          // the window: an upsert that MOVES a key across groups and a
          // tombstone — the deltas MIN/MAX cannot fold and keyed must
          // classify
          fact.set(Seq((1L, "b", 12.0)).toDF("k", "g", "v"))
          fact.merge(Seq((3L, "a", 30.0, true)).toDF("k", "g", "v", "d"),
            $"d")
          def cycle(): Unit = {
            if (mode == "keyed")
              graft.api.IncrementalRollup.cycleKeyed(spark, factDir,
                "f_cur", s"$cat.db.agg", "g", Seq("v" -> "sv"))
            else
              graft.api.IncrementalRollup.cycleRefresh(spark, factDir,
                "f_cur", s"$cat.db.agg", "g", Seq(("max", "v", "mv")))
            ()
          }
          killer.count.set(0)
          killer.killAt = killPoint
          val crashed =
            try { cycle(); false }
            catch { case t: Throwable if isInjected(t) => true }
          killer.killAt = -1
          if (!crashed) sawClean = true
          else cycle() // the retry contract
          val got = graft.api.Collection(spark, aggDir).toDF()
            .select($"g", $"n",
              (if (mode == "keyed") $"sv" else $"mv").cast("double"))
            .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
          val expect =
            if (mode == "keyed") Seq(("b", 2L, 32.0)) // a emptied out
            else Seq(("b", 2L, 20.0))
          assert(got == expect,
            s"[$mode kill=$killPoint] rollup diverged: $got")
          assert(graft.api.IncrementalRollup.protocolBreaks(
            java.nio.file.Paths.get(aggDir)) == 0L,
            s"[$mode kill=$killPoint] protocol break on healthy replay")
          spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
          spark.conf.unset(s"spark.sql.catalog.$cat")
          killPoint += 1
        }
        info(s"[$mode] swept ${killPoint - 1} commit points")
        assert(killPoint > 3, s"[$mode] too few commit points")
      }
    } finally graft.meta.FileIO.impl = prev
  }

  test("a crash between sweepComponents' state and keep-list rewrites " +
      "heals on the documented re-run") {
    underEachFileIO { fio =>
      val killer = new KillingFileIO(graft.meta.FileIO.impl)
      val prev = graft.meta.FileIO.impl
      graft.meta.FileIO.impl = killer
      try {
        var killPoint = 1
        var sawClean = false
        while (!sawClean) {
          val wh = java.nio.file.Files
            .createTempDirectory(s"faultsweep_${fio}_$killPoint").toString
          val st = s"$wh/state"; val kp = s"$wh/keep"
          killer.killAt = -1
          ClusterOps.componentsUpdate(spark,
            Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("a", "b"),
            "a", "b", st, keepPath = Some(kp))
          val live = Seq(11L, 12L, 20L, 21L).toDF("doc_id")
          killer.count.set(0)
          killer.killAt = killPoint
          val crashed =
            try { ClusterOps.sweepComponents(spark, st, live,
              keepPath = Some(kp)); false }
            catch { case t: Throwable if isInjected(t) => true }
          killer.killAt = -1
          if (!crashed) sawClean = true
          else ClusterOps.sweepComponents(spark, st, live,
            keepPath = Some(kp)) // the documented re-run contract
          val mat = ClusterOps.keepListMaterialized(spark, kp)
            .as[(Long, Long, Long)].collect().sorted.toSeq
          assert(mat == Seq((11L, 11L, 2L), (20L, 20L, 2L)),
            s"[$fio kill=$killPoint] swept keep-list diverged: $mat")
          assert(mat == ClusterOps.keepList(spark, st)
            .as[(Long, Long, Long)].collect().sorted.toSeq)
          killPoint += 1
        }
        info(s"[$fio] swept ${killPoint - 1} sweep commit points")
      } finally graft.meta.FileIO.impl = prev
    }
  }

  test("every inter-commit crash point of a pair-log star sweep recovers " +
      "by resuming the loop (cycle-then-sweep), both FileIO impls") {
    underEachFileIO { fio =>
      val killer = new KillingFileIO(graft.meta.FileIO.impl)
      val prev = graft.meta.FileIO.impl
      graft.meta.FileIO.impl = killer
      try {
        var killPoint = 1
        var sawClean = false
        while (!sawClean) {
          val wh = java.nio.file.Files
            .createTempDirectory(s"faultpairs_${fio}_$killPoint").toString
          val pairsP = s"$wh/pairs"; val st = s"$wh/state"
          killer.killAt = -1
          // a redundant triangle so the sweep genuinely rewrites
          Seq((10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
            .write.format("hadro").mode("overwrite").save(pairsP)
          ClusterOps.componentsCycle(spark, pairsP, "fp_cur", st)
          killer.count.set(0)
          killer.killAt = killPoint
          val crashed =
            try { ClusterOps.sweepPairs(spark, pairsP, st); false }
            catch { case t: Throwable if isInjected(t) => true }
          killer.killAt = -1
          if (!crashed) sawClean = true
          else {
            // the documented recovery: RESUME THE LOOP, never retry the
            // verb blind — a crash after the replace commit leaves every
            // cursor one version behind it, so cycle (idempotent star
            // re-fold) then sweep (reclaims 0 on an already-swept log)
            ClusterOps.componentsCycle(spark, pairsP, "fp_cur", st)
            ClusterOps.sweepPairs(spark, pairsP, st)
            ()
          }
          // the loop continues across whatever the crash left behind
          Seq((12L, 30L)).toDF("doc_a", "doc_b")
            .write.format("hadro").mode("append").save(pairsP)
          ClusterOps.componentsCycle(spark, pairsP, "fp_cur", st)
          val members = ClusterOps.components(spark, st)
            .as[(Long, Long)].collect().sorted.toSeq
          assert(members ==
            Seq((10L, 10L), (11L, 10L), (12L, 10L), (30L, 10L)),
            s"[$fio kill=$killPoint] membership diverged: $members")
          killPoint += 1
        }
        info(s"[$fio] swept ${killPoint - 1} pair-sweep commit points")
      } finally graft.meta.FileIO.impl = prev
    }
  }
}
