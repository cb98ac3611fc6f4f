package graft.operators

import graft.SparkTestBase

/** Hand-computed fixed point of GraphOps.pagerank on a 3-node path graph
  * A–B–C (symmetrized): verifies the exact integer arithmetic the q121
  * oracle replays, independent of any corpus.
  *
  * deg: A=1, B=2, C=1; r0 = 1e6 each.
  * round 1: r(A)=r(C)=150000+⌊85·⌊1e6/2⌋/100⌋=575000;
  *          r(B)=150000+⌊85·(1e6+1e6)/100⌋=1850000
  * round 2: r(A)=r(C)=150000+⌊85·⌊1850000/2⌋/100⌋=936250;
  *          r(B)=150000+⌊85·(575000+575000)/100⌋=1127500
  * round 3: r(A)=r(C)=150000+⌊85·⌊1127500/2⌋·1.0/100⌋=629187
  *          (479187.5 floors to 479187);
  *          r(B)=150000+⌊85·(936250+936250)/100⌋=1741625
  */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("pagerank matches the hand-computed 3-iteration fixed point") {
    val edges = Seq(
      ("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")
    ).toDF("src", "dst")
    val got = GraphOps.pagerank(edges, 3)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("A", 1L, 629187L), ("B", 2L, 1741625L), ("C", 1L, 629187L)))
  }

  test("one iteration of a 2-clique is symmetric and conserves the teleport") {
    val edges = Seq(("X", "Y"), ("Y", "X")).toDF("src", "dst")
    val got = GraphOps.pagerank(edges, 1)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // each node receives the other's full rank: 150000 + 850000
    assert(got.toSeq == Seq(("X", 1L, 1000000L), ("Y", 1L, 1000000L)))
  }
}
