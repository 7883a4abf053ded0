package graft

import org.apache.spark.sql.functions._

import graft.operators.Components

class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cliques, self-loops and duplicate edges resolve to min-id roots") {
    // two chains + a triangle + a self-loop + duplicate edges
    val got = comps(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),           // chain -> 1
      (10L, 11L), (11L, 10L), (10L, 11L),     // dup/reversed -> 10
      (20L, 21L), (21L, 22L), (20L, 22L),     // triangle -> 20
      (30L, 30L)))                            // self-loop only: no edge survives
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L && got(4L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L)
    // a node seen only in self-loops has no edges -> absent by contract
    assert(!got.contains(30L))
  }

  test("matches a driver union-find on a random graph") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(400)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    // reference: classic union-find
    val parent = scala.collection.mutable.Map((0L until 120L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(i => i -> find(i)).toMap
    assert(comps(pairs) == expected)
  }

  test("a long path converges (pointer jumping beats plain propagation)") {
    // path of 300 nodes: plain min-propagation needs ~300 rounds; the
    // contraction + pointer-jump loop must finish well inside maxIter
    val pairs = (0L until 299L).map(i => (i, i + 1))
    val got = comps(pairs)
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("distributed rounds and the driver finish agree on every graph shape") {
    // driverFinishEdges = 0 pins the fully-distributed path (the default
    // would collect these small graphs immediately); labels must be
    // identical either way — same roots, same min-id canonicalization
    val rng = new scala.util.Random(13)
    val shapes = Seq(
      Seq.fill(400)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
        .filter { case (a, b) => a != b },              // random
      (0L until 299L).map(i => (i, i + 1)),             // long path
      (1L to 30L).flatMap(i => (i + 1).to(30L).map((i, _))).toSeq) // clique
    shapes.foreach { pairs =>
      val dist = Components.connectedComponents(pairs.toDF("a", "b"),
          driverFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == comps(pairs))
    }
  }

  test("minhashDedupExact collapses transitive chains the single pass keeps") {
    // A/B/C form a similarity chain: B shares half its text with each of
    // A and C, but A and C share nothing — exact closure keeps only A
    val half1 = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val half2 = (1 to 40).map(i => s"beta$i").mkString(" ")
    val half3 = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, s"$half1 $half1"), (2L, s"$half1 $half2"), (3L, s"$half2 $half2"),
      (4L, s"$half2 $half3"), (5L, s"$half3 $half3"),
      (9L, "something entirely different and unrelated")).toDF("id", "text")
    val kept = graft.operators.Dedup
      .minhashDedupExact(docs, "id", "text", bands = 32)
      .select("id").as[Long].collect().sorted
    // the whole 1..5 chain is one component -> keep 1; 9 untouched
    assert(kept.sameElements(Array(1L, 9L)), kept.mkString(","))
  }

  test("clusterDedup keeps the min-id representative and untouched rows") {
    val df = (1 to 10).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    val pairs = Seq((2L, 3L), (3L, 4L), (7L, 9L)).toDF("a", "b")
    val kept = Components.clusterDedup(df, "id", pairs)
      .select("id").as[Long].collect().sorted
    // {2,3,4} -> keep 2; {7,9} -> keep 7; others untouched
    assert(kept.sameElements(Array(1L, 2L, 5L, 6L, 7L, 8L, 10L)))
    val sizes = Components.componentSizes(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(2L -> 3L, 7L -> 2L))
  }
}
