package graft

import org.scalatest.funsuite.AnyFunSuite

/** The serving fan-out knob (`graft.serving.minRowsPerWorker`) may only
  * change latency, never rows: single-query and fleet results must be
  * identical whether the packed scan runs serial, 2-way, or fully
  * parallel (worker-local heaps merge with the same tie-breaking as
  * the final rank). */
class ServingFanoutSpec extends AnyFunSuite {
  import graft.search.ServingSession

  private val Prop = "graft.serving.minRowsPerWorker"
  private val dim = 32
  private val n = 20000 // above the parallel threshold
  private val rnd = new scala.util.Random(11)
  private lazy val idx = ServingSession.fromLocalRows(
    Iterator.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))), dim)
  private val queries = Seq.tabulate(8)(qi =>
    (qi.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))

  private def withProp[A](v: String)(body: => A): A = {
    val old = sys.props.get(Prop)
    System.setProperty(Prop, v)
    try body finally old match {
      case Some(o) => System.setProperty(Prop, o)
      case None => System.clearProperty(Prop)
    }
  }

  // serial (one worker), few big workers, max fan-out
  private val fanouts = Seq(s"${n + 1}", "8192", "512")

  test("searchOne rows identical across fan-out widths") {
    val ref = withProp(fanouts.head)(idx.searchOne(queries.head._2, 10))
    assert(ref.size === 10)
    fanouts.tail.foreach { f =>
      assert(withProp(f)(idx.searchOne(queries.head._2, 10)) === ref,
        s"fan-out $f diverged")
    }
  }

  test("fleet rows identical across fan-out widths") {
    val ref = withProp(fanouts.head)(idx.search(queries, 10))
    assert(ref.size === queries.size * 10)
    fanouts.tail.foreach { f =>
      assert(withProp(f)(idx.search(queries, 10)) === ref, s"fan-out $f diverged")
    }
  }
}
