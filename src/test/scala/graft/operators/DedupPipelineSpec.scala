package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Properties of the dedup/decontam-composition queries added in round
  * 11: q173 cluster-representative selection (one quality-max keeper per
  * near-dup cluster), q174 leakage-safe split (cluster members co-travel,
  * and the report's counts reconcile against an independent Scala
  * recomputation), q175 yield funnel (monotone cascade that covers the
  * corpus), q176 contamination provenance (argmax equals the brute-force
  * per-pair overlap truth). q173–q175 ride the shared dup-cc connected-
  * components cache; q173's agreement with q89's labels is pinned. */
class DedupPipelineSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def md5bucket(key: String, mod: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % mod
  }

  private def repRows() =
    SparkEntry.queries("q173_cluster_rep")(spark, dir)
      .select("doc_id", "cluster_id", "cluster_size", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("q173: exactly one keeper per cluster, the quality-max member, sizes covering the corpus") {
    val rows = repRows()
    val nd = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(array_distinct(split(col("text"), " "))).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nDocs = nd.size
    assert(rows.length == nDocs, "every doc gets a verdict, singletons included")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cl, members) =>
      assert(members.forall(_._3 == members.length.toLong),
        s"cluster_size must equal the member count in cluster $cl")
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"exactly one keeper in cluster $cl")
      val best = members.map(m => (-nd(m._1), m._1)).min
      assert(keepers.head._1 == best._2,
        s"keeper must be the (max nd, min doc_id) member of cluster $cl")
    }
    // cluster labels agree with q89 on every doc q89 labels; docs q89
    // does not label are singletons keeping themselves
    val q89 = SparkEntry.queries("q89_dup_clusters")(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, cl, _, keep) =>
      q89.get(d) match {
        case Some(l) => assert(cl == l, s"doc $d cluster label diverges from q89")
        case None => assert(cl == d && keep, s"unlabelled doc $d must keep itself")
      }
    }
  }

  test("q174: members co-travel, counts reconcile, and a doc-keyed split WOULD leak") {
    val rows = repRows()
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def splitOf(b: Long) = if (b < 80) "train" else if (b < 90) "val" else "test"
    // independent Scala recomputation of the full report
    val perDoc = rows.map { case (d, cl, _, _) =>
      (splitOf(md5bucket(cl.toString, 100)), src(d), d, cl)
    }
    val expect = perDoc.groupBy(p => (p._1, p._2)).map { case (k, g) =>
      k -> (g.length.toLong, g.map(_._4).distinct.length.toLong)
    }
    val got = SparkEntry.queries("q174_split_leakage")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, "report must match the Scala recomputation")
    assert(got.values.map(_._1).sum == rows.length.toLong,
      "n_docs must cover the corpus")
    // co-travel is structural (split is a function of cluster_id); the
    // property worth paying for: the naive doc-keyed rule separates at
    // least one multi-doc cluster that the cluster-keyed rule keeps whole
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assume(multi.nonEmpty, "corpus has near-dup clusters at this sf")
    val leaky = multi.exists { case (_, members) =>
      members.map(m => splitOf(md5bucket(m._1.toString, 100)))
        .distinct.length > 1
    }
    assert(leaky,
      "expected ≥1 cluster whose members a doc-keyed split would scatter " +
        "(if this ever fails the fixture got too small to demonstrate leakage)")
  }

  test("q177: shares are a bp-partition of the token mass and reconcile with q173's keeps") {
    val rows = SparkEntry.queries("q177_dedup_mixture_shift")(spark, dir)
      .collect()
    val nSources = rows.length
    def sums(c: String) = rows.map(_.getAs[Long](c)).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("tok_after") <= r.getAs[Long]("tok_before"),
        s"dedup cannot add tokens (${r.getString(0)})")
      assert(r.getAs[Long]("shift_bp") ==
        r.getAs[Long]("share_after_bp") - r.getAs[Long]("share_before_bp"))
    }
    // integer div floors per source: each share column sums to 10000
    // minus at most one bp per source; shifts cancel within the same band
    assert(sums("share_before_bp") > 10000L - nSources
      && sums("share_before_bp") <= 10000L)
    assert(sums("share_after_bp") > 10000L - nSources
      && sums("share_after_bp") <= 10000L)
    assert(math.abs(sums("shift_bp")) < nSources.toLong)
    // tok_after reconciles with the q173 verdict exactly
    val keeps = repRows().filter(_._4).map(_._1).toSet
    val keptTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
      .collect().filter(r => keeps(r.getLong(0))).map(_.getLong(1)).sum
    assert(sums("tok_after") == keptTokens,
      "q177's kept token mass must equal the q173 keep set's")
  }

  test("q176: provenance argmax equals the brute-force per-pair overlap truth") {
    val rows = SparkEntry.queries("q176_contam_provenance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // brute force in Scala over the raw corpus: same split, same
    // shingles, full pair overlap counts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val shingled = docs.collect { case (d, t) if sh(t).nonEmpty => d -> sh(t) }
    val bk = shingled.keys.map(d => d -> md5bucket(d.toString, 100)).toMap
    val train = shingled.filter { case (d, _) => bk(d) < 80 }
    val test = shingled.filter { case (d, _) => bk(d) >= 90 }
    val expect = test.flatMap { case (td, ts) =>
      val overlaps = train.map { case (rd, rs) => rd -> (ts & rs).size }
        .filter(_._2 > 0)
      if (overlaps.isEmpty) None
      else {
        val (rd, n) = overlaps.toSeq.map { case (r, n) => ((-n, r), (r, n)) }
          .min._2
        Some((td, ts.size, rd, n.toLong, n.toLong * 10000 / ts.size))
      }
    }.toSet
    assert(rows.toSet == expect,
      "q176 must equal the brute-force argmax over all train overlaps")
    assert(rows.nonEmpty, "fixture must exercise the provenance path")
  }

  test("q175: cascade is monotone per source and covers the corpus") {
    val rows = SparkEntry.queries("q175_yield_funnel")(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == nDocs)
    rows.foreach { r =>
      val c = Seq("n_total", "n_len_ok", "n_quality_ok", "n_exact_unique",
        "n_canonical").map(r.getAs[Long])
      assert(c.zip(c.tail).forall { case (a, b) => a >= b },
        s"funnel must be monotone non-increasing for source ${r.getString(0)}: $c")
      assert(c.forall(_ >= 0L))
    }
    assert(rows.map(_.getAs[Long]("n_canonical")).sum > 0L,
      "a healthy corpus keeps something")
  }
}
