package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  // threshold 0 forces the distributed star rounds — the spec's default
  // so the algorithm itself (not just the union-find finish) is pinned
  private def labels(pairs: Seq[(Long, Long)],
      localThreshold: Long = 0L): Map[Long, Long] =
    ConnectedComponents
      .connectedComponents(pairs.toDF("a", "b"), "a", "b",
        localFinishThreshold = localThreshold)
      .as[(Long, Long)].collect().toMap

  test("known graph: two chains + isolated edge, min-id labels") {
    // 1-2-3-4 (a chain greedy pair removal can't see through), 7-5-6, 9-8
    val got = labels(Seq((1L, 2L), (3L, 2L), (3L, 4L), (7L, 5L), (5L, 6L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("empty and self-loop-only inputs yield no components") {
    assert(labels(Seq.empty).isEmpty)
    assert(labels(Seq((3L, 3L))).isEmpty)
  }

  test("differential: random graph vs in-test union-find") {
    // Deterministic pseudo-random graph: 120 edges over 80 vertices.
    val edges = (0 until 120).map { i =>
      val a = (i * 7919L) % 80
      val b = (i * i * 104729L + 13) % 80
      (a, b)
    }.filter { case (a, b) => a != b }

    val parent = scala.collection.mutable.Map((0L until 80L).map(v => v -> v): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val want = touched.map(v => v -> find(v)).toMap

    assert(labels(edges) == want)
  }

  test("local union-find finish agrees with the distributed rounds") {
    val edges = (0 until 150).map { i =>
      ((i * 6007L) % 60, (i * i * 31L + 7) % 60)
    }.filter { case (a, b) => a != b }
    assert(labels(edges, localThreshold = 1L << 20) == labels(edges, 0L))
  }

  test("long chain converges within the round budget (log² n, not diameter)") {
    // 300-vertex path: plain label propagation needs ~300 rounds; the
    // star algorithm must finish well inside maxIters=30.
    val got = labels((0L until 299L).map(i => (i, i + 1)))
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("removePairsTransitive keeps exactly one doc per cluster") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("id", "text")
    // pairs 1~2, 2~3 : greedy removePairs drops {2,3}; transitive also
    // drops them but via component labels; 5~6 drops 6; 4 untouched.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents
      .removePairsTransitive(docs, pairs, "id")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))

    // The case that separates transitive from greedy: A~B, B~C pairs
    // where (A,C) never appears — component {A,B,C} keeps only A even
    // when B is only ever on the id_a side of one pair.
    val chainPairs = Seq((2L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val keptChain = ConnectedComponents
      .removePairsTransitive(docs, chainPairs, "id")
      .select("id").as[Long].collect().sorted
    assert(keptChain.toSeq == Seq(1L, 4L, 5L, 6L))
  }
}
