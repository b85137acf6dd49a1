package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def check(minTests: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  private def assigned(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.assign(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction equals union-find on random graphs (property)") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 30L)
      b <- Gen.chooseNum(0L, 30L)
    } yield (a, b)
    check(12)(Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      val real = edges.filter { case (a, b) => a != b }
      real.isEmpty || assigned(real) == unionFind(real)
    })
  }

  test("long chain: contracts in far fewer rounds than its diameter") {
    // a 64-node path — diameter 63, propagation would need 63 rounds;
    // star contraction must land every node on component 0 within the
    // assign() round cap (log-bounded)
    val chain = (0L until 63L).map(i => (i, i + 1))
    val out = assigned(chain)
    assert(out.size === 64)
    assert(out.values.toSet === Set(0L))
  }

  test("multiple components keep distinct minima as ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    val out = assigned(edges)
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }
}
