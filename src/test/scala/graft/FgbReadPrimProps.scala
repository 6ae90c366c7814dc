package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed

import graft.geometry.{FgbMeta, FlatGeobuf}

/** Property fuzz for the two new fgb read primitives: coalesced run
  * reads and the positioned R-tree walk must be EXACTLY equivalent to
  * their naive/in-memory counterparts on arbitrary layouts and query
  * boxes — these sit on every connector read path, so an off-by-one in
  * run extension or level walking is a silent wrong answer. */
object FgbReadPrimProps extends Properties("fgb-read-prims") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(sys.env.get("FUZZ_SEED").map(_.toLong).getOrElse(918273L)))
      .withMinSuccessfulTests(150)

  private final class Mem(data: Array[Byte]) extends graft.io.PositionedReader {
    var calls = 0
    override def size(): Long = data.length
    override def read(dst: java.nio.ByteBuffer, position: Long): Int = {
      calls += 1
      if (position >= data.length) return -1
      val n = math.min(dst.remaining(), data.length - position.toInt)
      dst.put(data, position.toInt, n); n
    }
    override def close(): Unit = ()
  }

  // ---------------------------------------------------------- readRuns
  // arbitrary feature layout: random lengths, random gaps (0 = dense)
  private val layoutGen = for {
    n <- Gen.choose(1, 120)
    lens <- Gen.listOfN(n, Gen.choose(1, 64))
    gaps <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const(0), 1 -> Gen.choose(1, 16)))
    maxRun <- Gen.choose(8, 512)
    start <- Gen.choose(0, 32)
  } yield (lens, gaps, maxRun, start)

  property("readRuns == naive per-feature reads on any layout") =
    Prop.forAll(layoutGen) { case (lens, gaps, maxRun, start) =>
      var pos = start.toLong
      val offs = new Array[Long](lens.length)
      for (i <- lens.indices) {
        pos += gaps(i)
        offs(i) = pos
        pos += lens(i)
      }
      val total = pos.toInt + 8
      val data = Array.tabulate[Byte](total)(i => (i * 131 + 7).toByte)
      val r = new Mem(data)
      val got = FgbMeta.readRuns(r, offs, lens.toArray, maxRun).toSeq
      val want = lens.indices.map { i =>
        (i, data.slice(offs(i).toInt, offs(i).toInt + lens(i)).toSeq)
      }
      (got.map { case (k, b) => (k, b.toSeq) } == want) :| "bytes" &&
        (r.calls <= lens.length) :| "never more reads than features"
    }

  // ------------------------------------------- positioned R-tree walk
  private val treeGen = for {
    n <- Gen.choose(1, 400)
    nodeSize <- Gen.oneOf(2, 3, 4, 16)
    pts <- Gen.listOfN(n, for {
      x <- Gen.choose(0, 1000); y <- Gen.choose(0, 1000)
      w <- Gen.choose(0, 30); h <- Gen.choose(0, 30)
    } yield (x.toDouble, y.toDouble, (x + w).toDouble, (y + h).toDouble))
    box <- for {
      x <- Gen.choose(-50, 1050); y <- Gen.choose(-50, 1050)
      w <- Gen.choose(0, 400); h <- Gen.choose(0, 400)
    } yield (x.toDouble, y.toDouble, (x + w).toDouble, (y + h).toDouble)
  } yield (pts, nodeSize, box)

  property("searchIndexPositioned == searchIndex on any tree and box") =
    Prop.forAll(treeGen) { case (pts, nodeSize, box) =>
      // leaf items in arrival order (the builder expects Hilbert order
      // only for locality, not correctness)
      val items = pts.zipWithIndex.map { case ((x0, y0, x1, y1), i) =>
        FlatGeobuf.Node(x0, y0, x1, y1, i.toLong * 100)
      }.toArray
      val idx = FlatGeobuf.buildIndex(items, nodeSize)
      val (qx0, qy0, qx1, qy1) = box
      val whole = FlatGeobuf.searchIndex(idx, items.length, nodeSize,
        qx0, qy0, qx1, qy1).toSet
      val r = new Mem(idx)
      val walked = FgbMeta.searchIndexPositioned(r, 0L, items.length,
        nodeSize, qx0, qy0, qx1, qy1).toSet
      (walked == whole) :| s"hits ${walked.size} vs ${whole.size}" &&
        // and both equal the brute-force closed-intersection answer
        (whole == pts.zipWithIndex.collect {
          case ((x0, y0, x1, y1), i)
            if !(x0 > qx1 || x1 < qx0 || y0 > qy1 || y1 < qy0) =>
            (i.toLong * 100, i)
        }.toSet) :| "brute force"
    }
}
