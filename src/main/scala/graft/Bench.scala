package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Materialization: results are written to the `noop` sink, which fully
  * executes the physical plan (every operator, every column) without
  * filesystem cost — `.count()` would let Spark prune columns and skip
  * most compute (VERDICT r1 "What's wrong").
  *
  * Timing: each query runs `iters` times (default 3) and reports the
  * MEDIAN; a single-iteration harness produced phantom 3x "regressions"
  * from run-to-run noise (VERDICT r3: q22 reported 6.08s, re-timed at
  * 1.3s). First-run times are kept in a separate `first_run` map so
  * cold-path cost stays visible. Failed queries report -1 and are
  * excluded from the total instead of being timed in.
  */
object Bench {

  /** The pids of FOREIGN JVMs: java processes that are neither this
    * process nor one of its ancestors (the sbt chain that forked this
    * run is expected and harmless; anything else is competing for the
    * same cores and contaminates every wall-clock in the artifact —
    * the r16 lesson, where 4 stale JVMs turned an 8 s query into a
    * committed 91 s "regression"). Pure so BenchSpec can pin the
    * classification: `procs` = (pid, ppid, comm). */
  private[graft] def foreignJvms(procs: Seq[(Long, Long, String)],
                                 self: Long): Seq[Long] = {
    val parentOf = procs.map(p => p._1 -> p._2).toMap
    @annotation.tailrec
    def ancestors(p: Long, acc: Set[Long]): Set[Long] =
      parentOf.get(p) match {
        case Some(pp) if pp > 0 && !acc.contains(pp) => ancestors(pp, acc + pp)
        case _ => acc
      }
    val keep = ancestors(self, Set(self))
    procs.collect {
      case (pid, _, comm) if comm.contains("java") && !keep.contains(pid) => pid
    }.sorted
  }

  /** 1-minute loadavg (round 18, verdict item 5): the JVM preflight
    * sees java processes only, so the r17 driver artifact read 3×
    * quiet on every query with no dirty stamp — the harness's own
    * non-JVM load (DuckDB/python legs) escaped it. The loadavg at
    * start AND end rides the line as `"load":[a,b]`, so a
    * non-JVM-contaminated window is machine-detectable too (stamp,
    * don't refuse — readers discount, re-runs confirm). */
  private def loadAvg1m(): Double = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split(" ").head.toDouble
  } catch { case _: Throwable => -1.0 }

  /** /proc census → [[foreignJvms]]. Unreadable entries (racing exits,
    * permissions) drop silently — the preflight is a best-effort
    * honesty stamp, never a crash path. */
  private def scanForeignJvms(): Seq[Long] = try {
    val self = ProcessHandle.current().pid()
    val procs = Option(new java.io.File("/proc").listFiles()).getOrElse(Array.empty)
      .toSeq.filter(_.getName.forall(_.isDigit)).flatMap { f =>
        try {
          val pid = f.getName.toLong
          val stat = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/$pid/stat")), "UTF-8")
          val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
          val comm = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/$pid/comm")), "UTF-8").trim
          Some((pid, rest(1).toLong, comm))
        } catch { case _: Throwable => None }
      }
    foreignJvms(procs, self)
  } catch { case _: Throwable => Nil }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // wall-budget + heavy-query shedding (round 17, verdict item 8: the
    // driver's bench window timed out at 178 registered queries × 3
    // iters × 2 runs — an artifact that never prints is worse than one
    // with fewer iterations). A query whose FIRST iteration runs past
    // `heavySec` keeps that single measurement (the certification
    // composites are plan-compile-bound — iterating them 3× buys noise
    // reduction nobody reads at 20 s scale); once total elapsed passes
    // `budgetSec` every remaining query drops to 1 iteration; and the
    // back-to-back control run is skipped entirely when the projected
    // finish would overrun the budget.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1200").toDouble
    val heavySec = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAVY_SEC", "6").toDouble
    val benchStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchStart) / 1e9
    // idle preflight (round 17, verdict item 1): a dirty window must
    // never again produce a protocol-shaped artifact that READS clean.
    // Foreign JVMs found before or after the run ride the JSON line as
    // "dirty":N — readers discard or re-run, per the house protocol.
    val dirtyBefore = scanForeignJvms()
    if (dirtyBefore.nonEmpty)
      System.err.println(s"[bench] DIRTY WINDOW: foreign JVMs alive at start: " +
        dirtyBefore.mkString(","))
    GraftSession.warnHugeHeap("bench")
    val loadStart = loadAvg1m()
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: first query otherwise pays JVM/codegen/file-listing startup
    // (~4s) that is not a property of the query being measured
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q37,q39 times just
    // those queries (prefix match); unset = the full registered suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only.fold(SparkEntry.queries.toSeq) { pfx =>
      SparkEntry.queries.toSeq.filter { case (n, _) => pfx.exists(n.startsWith) }
    }
    // ANN build/search split (VERDICT r8): the KMeans index artifacts
    // are one-time persistable builds by design (day-2 appends extend
    // them without re-fitting), so timing build+search per iteration
    // measured training noise, not the search path a user pays per
    // query — and re-training dominated q36/q47/q48's numbers. Build
    // ONCE here (timed, reported in the "build" map), localCheckpoint
    // standing in for the persisted parquet artifact, and let the
    // timed loop run search-only closures against it.
    import graft.operators.Similarity
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // builds follow the same failure convention as the timed loop
    // (advice r9): a KMeans build failure logs, drops the build entry,
    // and the query falls back to its registered build+search closure —
    // which is then timed normally or benched as -1 if it also fails.
    // A build failure must never abort the whole run unmetered.
    def tryBuild(n: String)(b: => (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[(String, (Double, (SparkSession, String) => org.apache.spark.sql.DataFrame))] =
      try { val (f, t) = timed(b); Some(n -> ((t, f))) }
      catch { case e: Throwable =>
        System.err.println(
          s"[bench] $n build failed: ${e.getMessage} — falling back to registered closure")
        None
      }
    val annBuilds: Map[String, (Double, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      selected.map(_._1).sorted.collect {
        case n @ "q36_ann_ivf" => tryBuild(n) {
          val (a0, c0) = Similarity.buildIvfIndex(Tables(spark, sfDir).embeddings)
          val a = a0.localCheckpoint()
          (_: SparkSession, _: String) => Similarity.annIvfSearch(a, c0)
        }
        case n @ "q47_ann_pq" => tryBuild(n) {
          val (e, cb) = Similarity.buildPqIndex(Tables(spark, sfDir).embeddings)
          (_: SparkSession, _: String) => Similarity.annPqSearch(e, cb)
        }
        case n @ "q48_ann_ivfpq" => tryBuild(n) {
          val (corpus, cents, cb) = Similarity.buildIvfPqIndex(Tables(spark, sfDir).embeddings)
          (_: SparkSession, _: String) => Similarity.annIvfPqSearch(corpus, cents, cb)
        }
        case n @ "q140_ann_imipq" => tryBuild(n) {
          val (corpus, c1b, c2b, cb) =
            Similarity.buildImiPqIndex(Tables(spark, sfDir).embeddings)
          (_: SparkSession, _: String) =>
            Similarity.annImiPqSearch(corpus, c1b, c2b, 4, cb)
        }
        // same convention at the exact-Jaccard tier: the three-part
        // prefix index is a one-time persistable artifact (day-2
        // batches probe it; appendToPrefixIndex grows it) — rebuilding
        // it per iteration would time the build, not the probe a user
        // pays per batch
        case n @ "q147_prefix_verdicts" => tryBuild(n) {
          import org.apache.spark.sql.functions.col
          import graft.operators.Dedup
          val docs = Tables(spark, sfDir).documents
          val corpus = docs.filter(col("doc_id") % 5 =!= 4)
          val batch = docs.filter(col("doc_id") % 5 === 4).localCheckpoint()
          val (p, g, v) = Dedup.buildPrefixIndex(corpus)
          val (pc, gc) = (p.localCheckpoint(), g.localCheckpoint())
          (_: SparkSession, _: String) =>
            Dedup.dedupAgainstPrefixIndex(batch, pc, gc, v)
        }
        // build-stamp extension (round 18, verdict item 4): the four
        // composite/trained queries whose one-time build cost rode
        // in-query — their registered functions already expose the
        // split, so the bench composes the SAME code: build once
        // (stamped in the "build" map), time the recurring probe side
        case n @ "q138_text_semdedup_imi" => tryBuild(n) {
          val probe = graft.operators.TextEmbed.textSemDedupImiSplit(spark, sfDir)
          (_: SparkSession, _: String) => probe()
        }
        case n @ "q141_ann_imipq_portable" => tryBuild(n) {
          val probe = Similarity.annImiPqPortableSplit(spark, sfDir)
          (_: SparkSession, _: String) => probe()
        }
        case n @ "q175_ann_trained_recall" => tryBuild(n) {
          val probe = Similarity.annImiPqTrainedRecallSplit(spark, sfDir)
          (_: SparkSession, _: String) => probe()
        }
        case n @ "q178_master_ingest" => tryBuild(n) {
          val probe = graft.operators.Pipeline.masterIngestDocsSplit(spark, sfDir)
          (_: SparkSession, _: String) => probe()
        }
        case n @ "q179_master_refresh" => tryBuild(n) {
          val probe = graft.operators.Pipeline.masterRefreshDocsSplit(spark, sfDir)
          (_: SparkSession, _: String) => probe()
        }
      }.flatten.toMap
    // (name, median, first-run, iterations actually timed) — the last
    // field is the SHED record (round 18, verdict item 8 + advice): a
    // single-sample median must be distinguishable from a true
    // iters-sample one in the artifact, not only on stderr
    def runSuite(): Seq[(String, Double, Double, Int)] =
      selected.sortBy(_._1).map { case (name, registered) =>
        val fn = annBuilds.get(name).map(_._2).getOrElse(registered)
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        var want = iters
        var it = 0
        while (it < want) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val t = (System.nanoTime() - t0) / 1e9
            times += t
            // shed: heavy single-query (first iteration past heavySec)
            // or a suite already past its wall budget — either way the
            // remaining iterations buy noise reduction the window
            // can't afford
            if (it == 0 && want > 1 && (t >= heavySec || elapsedSec >= budgetSec)) {
              if (t >= heavySec)
                System.err.println(s"[bench] $name heavy (${fmt(t)}s >= ${heavySec}s) — 1 iter")
              else
                System.err.println(s"[bench] budget ${budgetSec}s exceeded — $name drops to 1 iter")
              want = 1
            }
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          it += 1
        }
        val median =
          if (times.isEmpty) -1.0
          else times.sorted.apply(times.size / 2)
        (name, median, times.headOption.getOrElse(-1.0), times.size)
      }
    def shedOf(r: Seq[(String, Double, Double, Int)]): Seq[String] =
      r.collect { case (n, m, _, k) if m >= 0 && k < iters => n }
    val run1Start = elapsedSec
    val first = runSuite()
    val run1Wall = elapsedSec - run1Start
    val firstTotal = first.collect { case (_, m, _, _) if m >= 0 => m }.sum
    // crash-resilience: the harness parses the LAST JSON line of the
    // stdout tail, and Spark logs ride stderr in the forked run — so
    // printing the first-run-only line NOW means a run killed mid-rerun
    // still leaves a parseable artifact; the richer two-run line
    // supersedes it at the end of a full run
    // "/root/testdata/sf0.1" -> bare number 0.1; anything unparseable
    // stays a (short) quoted string so the line is still valid JSON
    val sf = scala.util.Try(sfDir.split("sf").last.toDouble.toString)
      .getOrElse("\"" + sfDir.takeRight(24) + "\"")
    println(metricsLine(first.map { case (n, m, _, _) => (n, m) }, firstTotal, sf, iters,
      builds = annBuilds.toSeq.map { case (n, (t, _)) => (n, t) }.sortBy(_._1),
      dirty = Some(dirtyBefore.size).filter(_ > 0),
      shed = Some(shedOf(first).size).filter(_ > 0),
      load = Some((loadStart, loadAvg1m()))))
    System.out.flush()
    // back-to-back second run (round 11), HEADLINE = the quieter run BY
    // CONSTRUCTION (round 12, verdict protocol item): two rounds
    // running, the first suite caught a loaded machine window while the
    // in-session rerun was clean (r11: 103.6 s vs 77.2 s on identical
    // code), so the headline `value`/`queries` are now the run with the
    // SMALLER total and the other run becomes the control. A real
    // regression reproduces in both totals; load noise lands in the
    // control where it belongs. The line carries the control TOTAL plus
    // control medians for only the queries whose two runs disagree
    // >1.3× (the suspects) — full duplication would blow the harness's
    // ~1950-char tail budget.
    val (results, total, control, detailRuns) =
      if (sys.env.get("SPARK_GRAFT_BENCH_CONTROL").contains("0"))
        (first.map { case (n, m, f0, _) => (n, m, f0) }, firstTotal,
          None, Seq(("run1", firstTotal, first)))
      else if (elapsedSec + run1Wall > budgetSec) {
        // the control run costs ≈ run 1 again; projecting past the
        // wall budget means the driver's window would kill the run
        // before ANY line prints — a run1 artifact beats a timeout
        System.err.println(s"[bench] budget: skipping control run " +
          s"(${fmt(elapsedSec)}s elapsed + ~${fmt(run1Wall)}s projected > ${budgetSec}s)")
        (first.map { case (n, m, f0, _) => (n, m, f0) }, firstTotal,
          None, Seq(("run1", firstTotal, first)))
      } else {
        val second = runSuite()
        val secondTotal = second.collect { case (_, m, _, _) if m >= 0 => m }.sum
        second.foreach { case (n, m, f0, _) =>
          System.err.println(s"[bench] rerun $n median=${fmt(m)} first=${fmt(f0)}")
        }
        // per-query MIN headline (round 18, verdict item 3): the min2
        // protocol picked the quieter TOTAL, but per-query noise still
        // leaked into the headline map — r17's entire "regression"
        // list was window variance that reverted in the other suite
        // (q127: 11.0 s headline, 3.9 s control). The headline map is
        // now min(run1, run2) PER QUERY; a query that failed one run
        // keeps the other's median (the coverage rule at query grain).
        val sMap = second.map { case (n, m, _, _) => n -> m }.toMap
        val fMap = first.map { case (n, m, _, _) => n -> m }.toMap
        val minq = first.map { case (n, m1, f0, _) =>
          val m2 = sMap.getOrElse(n, -1.0)
          val m = if (m1 < 0) m2 else if (m2 < 0) m1 else math.min(m1, m2)
          (n, m, f0)
        }
        val minqTotal = minq.collect { case (_, m, _) if m >= 0 => m }.sum
        // control.value = the quieter SUITE total over the same
        // succeeded set (exactly the r15–r17 min2 headline), so
        // cross-round TOTAL trends stay protocol-comparable; suspects
        // carry the >1.3× cross-run disagreers' SLOW-side medians (the
        // headline already holds their min). Floor 0.5s, cap 10 — the
        // tail budget is hard.
        def okSet(r: Seq[(String, Double, Double, Int)]): Set[String] =
          r.collect { case (n, m, _, _) if m >= 0 => n }.toSet
        val (fOk, sOk) = (okSet(first), okSet(second))
        val suiteCtrl =
          if (sOk == fOk) math.min(firstTotal, secondTotal)
          else if (sOk.size > fOk.size) secondTotal
          else firstTotal
        val suspects = minq.collect {
          case (n, _, _) if fMap.getOrElse(n, -1.0) > 0 && sMap.getOrElse(n, -1.0) > 0 &&
            math.max(fMap(n), sMap(n)) >= 0.5 &&
            math.max(fMap(n), sMap(n)) / math.min(fMap(n), sMap(n)) > 1.3 =>
            (n, math.max(fMap(n), sMap(n)))
        }.sortBy(-_._2).take(10)
        (minq, minqTotal, Some((suiteCtrl, suspects)),
          Seq(("run1", firstTotal, first), ("run2", secondTotal, second)))
      }
    // side artifact (round 15): the FULL-precision per-query record —
    // full names, medians, first-run times, builds, the complete
    // control map — so the in-band line can shed diagnostics safely as
    // the registry grows. The line carries name#md5-prefix; a reader
    // that finds the pointer verifies the file is THIS run's.
    // end-of-run re-scan: a JVM that APPEARED mid-run contaminated the
    // tail of the suite just as surely as a stale one at the start
    val dirtyAll = (dirtyBefore ++ scanForeignJvms()).distinct.sorted
    if (dirtyAll.nonEmpty)
      System.err.println(s"[bench] DIRTY WINDOW: foreign JVMs seen: ${dirtyAll.mkString(",")}")
    val dirtyStamp = Some(dirtyAll.size).filter(_ > 0)
    val loadEnd = loadAvg1m()
    val shedAll = detailRuns.flatMap { case (_, _, r) => shedOf(r) }.distinct.sorted
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full_latest.json")
    val fullPointer: Option[String] = try {
      def m(entries: Seq[(String, Double)]) =
        entries.map { case (n, v) => "\"" + n + "\":" + fmt(v) }.mkString("{", ",", "}")
      // BOTH suites ride the detail artifact in full (round 18 — the
      // headline map is per-query min, so a reader reconstructing
      // either suite needs the raw maps), with each run's value, its
      // full median map, and the EFFECTIVE iteration count for every
      // query that shed below the configured iters (advice item: a
      // single-sample median must be distinguishable in the artifact)
      val runsJson = detailRuns.map { case (tag, t, r) =>
        val itersShed = r.collect { case (n, m, _, k) if m >= 0 && k < iters =>
          "\"" + n + "\":" + k }.mkString("{", ",", "}")
        s""""$tag":{"value":${fmt(t)},"queries":${m(r.map { case (n, md, _, _) => (n, md) })},"iters_effective":$itersShed}"""
      }.mkString(""","runs":{""", ",", "}")
      val shedJson =
        if (shedAll.isEmpty) ""
        else shedAll.map("\"" + _ + "\"").mkString(""","shed":[""", ",", "]")
      val dirtyJson = dirtyStamp.fold("")(d => s""","dirty":$d""")
      val loadJson = s""","load":[${fmt(loadStart)},${fmt(loadEnd)}]"""
      val content =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$dirtyJson$loadJson,"sf":$sf,"iters":$iters""" +
          s""","queries":${m(results.map { case (n, md, _) => (n, md) })}""" +
          s""","first_run":${m(results.map { case (n, _, f0) => (n, f0) })}""" +
          s""","build":${m(annBuilds.toSeq.map { case (n, (t, _)) => (n, t) }.sortBy(_._1))}""" +
          shedJson + runsJson + "}\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        content.getBytes("UTF-8"))
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      Some(s"${new java.io.File(fullPath).getName}#$h")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] side artifact write failed: ${e.getMessage}")
      None
    }
    // The round harness keeps only the LAST 2000 chars of the log and
    // parses the JSON line out of that tail. Rounds 1-6 printed a
    // ~3.5k-char line (medians + first-run at full double precision),
    // so the head of the line was always cut. Round 7 shrank the line
    // to ~1.8k chars — and STILL parsed null, because sbt's logger
    // re-emitted it as "[info] {...}" with a "[success] Total time..."
    // trailer after it (both visible verbatim in BENCH_r07.json's
    // tail). Round 8: build.sbt switches the forked run to
    // StdoutOutput (no logger prefix) and showSuccess := false (no
    // trailer), and the line prints AFTER spark.stop() so nothing Spark
    // logs can land behind it. First-run times go to stderr (human
    // signal only); the stdout line schema lives in [[metricsLine]].
    results.foreach { case (n, m, f0) =>
      System.err.println(s"[bench] $n median=${fmt(m)} first=${fmt(f0)}")
    }
    annBuilds.toSeq.sortBy(_._1).foreach { case (n, (t, _)) =>
      System.err.println(s"[bench] $n build=${fmt(t)}")
    }
    val out = metricsLine(results.map { case (n, m, _) => (n, m) }, total, sf, iters,
      builds = annBuilds.toSeq.map { case (n, (t, _)) => (n, t) }.sortBy(_._1),
      control = control, full = fullPointer, dirty = dirtyStamp,
      shed = Some(shedAll.size).filter(_ > 0),
      load = Some((loadStart, loadEnd)))
    spark.stop()
    println(out)
    System.out.flush()
  }

  /** The stdout metrics line — the round artifact's ONLY machine-read
    * surface. SCHEMA (settled in round 9, spec-pinned in BenchSpec):
    * `queries` keys are each query's `qNN` prefix, ALWAYS — not a
    * degrade path. The r8 line measured 1,931 chars against the
    * harness's 1,950-char tail budget, so registering one more query
    * under full-name keys would have silently flipped every key; a
    * schema that depends on the registration count is not a schema.
    * Full names stay on stderr (`[bench] qNN_name median=… first=…`),
    * one line per query, where humans read them. Compact keys hold
    * ~140 queries in budget. Prefix collisions (two queries sharing a
    * qNN) would silently merge keys, so they fail loud here. */
  def metricsLine(medians: Seq[(String, Double)], total: Double, sf: String, iters: Int,
                  builds: Seq[(String, Double)] = Nil,
                  control: Option[(Double, Seq[(String, Double)])] = None,
                  full: Option[String] = None,
                  dirty: Option[Int] = None,
                  shed: Option[Int] = None,
                  load: Option[(Double, Double)] = None): String = {
    def fmt(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // map values: 2 decimals, trailing zeros trimmed (round 14 twice
    // over: at 144 registered queries the fixed-width line crossed the
    // 1950-char tail budget and shed its protocol marker IN PRACTICE;
    // at 154 not even shedding saved it. 10 ms quantization is far
    // below run-to-run noise, and the envelope totals stay fixed-3 for
    // cross-round trend continuity). `dp` drops to 1 on the deeper shed
    // steps below — NEVER to 0 for a measured query (r19 verdict item
    // 2: at 180 registered queries the 0-dp step printed every
    // sub-0.5 s query as `0`, which the driver's comparator reads as
    // MISSING — 36 real improvements were recorded `dropped_from_bench`.
    // A measured positive value now floors at the step's precision
    // (0.1 at 1 dp, 1 at 0 dp) so `0` can never mean "fast", and a
    // failed query stays `-1`, never 0).
    def fmtq(d: Double, dp: Int = 2) = {
      if (d < 0) "-1"
      else {
        val r0 = BigDecimal(d).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
        val minPos =
          if (dp <= 0) BigDecimal(1)
          else BigDecimal(1) / BigDecimal(10).pow(dp)
        val r = if (d > 0 && r0 < minPos) minPos else r0
        val s = r.toString
        if (s.contains('.')) {
          val t = s.reverse.dropWhile(_ == '0').reverse
          if (t.endsWith(".")) t.dropRight(1) else t
        } else s
      }
    }
    val keyed = medians.map { case (n, m) => (n.split("_").head, m) }
    val dups = keyed.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"qNN key collision in registered queries: ${dups.mkString(",")}")
    // back-to-back control (round 11): total of the in-session rerun,
    // plus control medians for only the >1.3× primary/control outliers
    // — the compact self-control that separates load noise (suspects
    // revert here) from real regressions (they reproduce)
    def assemble(suspectCap: Int, withBuilds: Boolean, qdp: Int,
                 withHeadline: Boolean, slim: Boolean = false): String = {
      val qs = keyed.map { case (k, m) => "\"" + k + "\":" + fmtq(m, qdp) }
        .mkString("{", ",", "}")
      // one-time index-build costs (ANN KMeans fits) ride separately so
      // the per-query medians stay the recurring search cost
      val bs =
        if (builds.isEmpty || !withBuilds) ""
        else builds.map { case (n, t) => "\"" + n.split("_").head + "\":" + fmtq(t, qdp) }
          .mkString(""","build":{""", ",", "}")
      // the control block is diagnostics: on the slim rungs it yields
      // its ~30 chars to per-query precision (measured r20: the 180-query
      // 1-dp line missed the tail by 9 chars with it, fit without it;
      // both suites ride the full-precision sidecar regardless)
      val cs = if (slim) "" else control.fold("") { case (ct, suspects) =>
        val kept = suspects.take(suspectCap)
        val sus =
          if (kept.isEmpty) ""
          else kept.map { case (n, t) => "\"" + n.split("_").head + "\":" + fmtq(t, qdp) }
            .mkString(""","suspects":{""", ",", "}")
        s""","control":{"value":${fmt(ct)}$sus}"""
      }
      // protocol marker (round-12 advice; round-14 nit: emitted on EVERY
      // line, not only inside the control block, so cross-round trend
      // readers always know which protocol produced the value): "minq"
      // (round 18) = per-query min over two back-to-back runs, with the
      // quieter SUITE total riding control.value for cross-round trend
      // continuity with the r15–r17 "min2" artifacts (which picked one
      // whole suite); "run1" = a single-run line (the crash-resilience
      // early print, or SPARK_GRAFT_BENCH_CONTROL=0)
      val hl =
        if (!withHeadline) ""
        else if (control.isDefined) ""","headline":"minq""""
        else ""","headline":"run1""""
      // the side-artifact pointer (name#md5-prefix of the full-precision
      // per-query record) rides EVERY shed level — on the two
      // last-resort `slim` rungs it narrows to its "#hash" form (the
      // file name is the fixed default; the hash is what verifies the
      // file is THIS run's), because per-query precision ≥1 dp beats
      // pointer verbosity (r20, verdict item 2)
      val fp = full.fold("") { p =>
        val v = if (slim) p.dropWhile(_ != '#') else p
        s""","full":"$v""""
      }
      // the dirty/shed/load stamps NEVER shed: an artifact that dropped
      // its own contamination marker (dirty JVMs, non-JVM load, or
      // single-sample medians masquerading as iters-sample ones) is the
      // exact failure the stamps exist to prevent (rounds 17–18).
      // `slim` trims load to 1 dp — the stamp survives, narrower.
      val dj = dirty.fold("")(d => s""","dirty":$d""")
      val sj = shed.fold("")(s => s""","shed":$s""")
      val ldp = if (slim) 1 else 2
      val lj = load.fold("") { case (a, b) => s""","load":[${fmtq(a, ldp)},${fmtq(b, ldp)}]""" }
      val it = if (slim) "" else s""","iters":$iters"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$hl$dj$sj$lj$fp,"sf":$sf$it$bs$cs,"queries":$qs}"""
    }
    // the harness keeps the LAST ~2000 chars: an over-budget line loses
    // its HEAD and stops parsing — so shed diagnostics in priority
    // order: suspects first (per-query control medians are the most
    // expendable), then the one-time build costs, then query precision
    // drops to 1 dp, then the envelope slims (headline/iters/pointer go,
    // load narrows — the stamps stay), and only then do values drop to
    // integers — FLOORED at 1, never 0 (a `0` read as "missing" by the
    // driver is the r19 failure this ladder exists to prevent; a
    // pathological all-queries-slow line never triggers the floor
    // anyway). The slim rungs may use the tail budget's last margin
    // (1992 of the harness's ~2000: the line prints after spark.stop()
    // with StdoutOutput and no [success] trailer, so line + newline is
    // genuinely the tail) because nothing prints after the line.
    val caps = control.map(_._2.size).getOrElse(0) to 0 by -1
    val rich = caps.map(assemble(_, withBuilds = true, qdp = 2, withHeadline = true)) ++ Seq(
      assemble(0, withBuilds = false, qdp = 2, withHeadline = true),
      assemble(0, withBuilds = false, qdp = 1, withHeadline = true))
    val slim1 = assemble(0, withBuilds = false, qdp = 1, withHeadline = false, slim = true)
    val slim0 = assemble(0, withBuilds = false, qdp = 0, withHeadline = false, slim = true)
    rich.find(_.length <= 1950)
      .orElse(Seq(slim1, slim0).find(_.length <= 1992))
      .getOrElse(slim0)
  }
}
