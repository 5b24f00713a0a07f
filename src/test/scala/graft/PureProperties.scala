package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Windows
import graft.sources.Ingest
import graft.viz.{Colors, GridUtils}
import graft.functions.Formatting

/** ScalaCheck properties for the driver-side pure functions (sbt runs
  * `Properties` natively). Spark-backed operators get their property-style
  * coverage in the ScalaTest specs; these laws need no session.
  */
object PureProperties extends Properties("graft.pure") {

  private val unit = Gen.chooseNum(0.0, 1.0)

  property("colors: rgb->hls->rgb round-trips") =
    forAll(unit, unit, unit) { (r, g, b) =>
      val (h, l, s) = Colors.toHls(r, g, b)
      val (r2, g2, b2) = Colors.hlsToRgb(h, l, s)
      math.abs(r - r2) < 1e-9 && math.abs(g - g2) < 1e-9 && math.abs(b - b2) < 1e-9
    }

  property("colors: lighten moves lightness monotonically toward white") =
    forAll(unit, unit, unit, unit) { (r, g, b, amt) =>
      val l0 = Colors.toHls(r, g, b)._2
      val (lr, lg, lb) = Colors.lighten(r, g, b, amt)
      Colors.toHls(lr, lg, lb)._2 >= l0 - 1e-9
    }

  property("gaussianWeights: normalized, symmetric, positive") =
    forAll(Gen.chooseNum(0.1, 10.0)) { sigma =>
      val w = Windows.gaussianWeights(sigma)
      math.abs(w.sum - 1.0) < 1e-9 &&
        w.indices.forall(i => math.abs(w(i) - w(w.length - 1 - i)) < 1e-12) &&
        w.forall(_ > 0)
    }

  property("gridSize: fits n and stays near-square") =
    forAll(Gen.chooseNum(1, 2000)) { n =>
      val (rows, cols) = GridUtils.gridSize(n)
      rows * cols >= n && (rows - 1) * cols < n && cols - rows <= 1
    }

  property("formatting: mantissa in [1,1000) for v >= 1, suffix consistent") =
    forAll(Gen.chooseNum(1.0, 1e17)) { v =>
      val s = Formatting.format(v, precision = 3)
      val mant = s.takeWhile(c => c.isDigit || c == '.').toDouble
      mant >= 0.999 && mant < 1000.0005
    }

  property("ingest.flatten: no nested maps survive, nulls dropped") = {
    val leafGen: Gen[Any] = Gen.oneOf(Gen.alphaStr, Gen.long, Gen.const(null))
    val datumGen: Gen[Map[String, Any]] = for {
      flat <- Gen.mapOf(Gen.zip(Gen.identifier, leafGen))
      sub <- Gen.mapOf(Gen.zip(Gen.identifier, leafGen))
      hasSub <- Gen.oneOf(true, false)
    } yield if (hasSub) flat + ("sub" -> sub) else flat
    forAll(datumGen) { d =>
      val f = Ingest.flatten(d)
      f.values.forall(v => v != null && !v.isInstanceOf[Map[_, _]])
    }
  }

  property("splitWithOverlap formulas: coverage and stride laws (scalar model)") =
    forAll(Gen.chooseNum(2, 200), Gen.chooseNum(1, 400)) { (len0, rows) =>
      val len = len0
      val overlap = len / 2
      val stride = len - overlap
      // scalar mirror of the operator's lo/hi formulas
      def segsOf(rn: Int): Range = {
        val hi = (rn - 1) / stride
        val lo = if (rn <= len) 0 else (rn - len + stride - 1) / stride
        lo to hi
      }
      (1 to rows).forall { rn =>
        val segs = segsOf(rn)
        segs.nonEmpty && segs.forall { s =>
          val pos = rn - 1 - s * stride
          pos >= 0 && pos < len
        }
      }
    }

  property("md5Bits64: equals the md5 hex prefix parsed big-endian") =
    forAll(Gen.alphaNumStr) { s =>
      val got = graft.functions.TextFunctions.md5Bits64Of(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString
      got == java.lang.Long.parseUnsignedLong(hex, 16)
    }

  private val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0)).map(_.toArray)

  property("signBucketsMultiProbe: flip differs from main in exactly one bit; mains agree") = {
    import graft.functions.VectorFunctions
    val planes = VectorFunctions.md5SignPlanes(4, 5, 16)
    forAll(vecGen) { v =>
      val data = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x: Any))
      val main = VectorFunctions.signBucketsOf(data, planes).toLongArray()
      val probe = VectorFunctions.signBucketsMultiProbeOf(data, planes, 1).toLongArray()
      val deep = VectorFunctions.signBucketsMultiProbeOf(data, planes, 3).toLongArray()
      (0 until 4).forall { t =>
        probe(2 * t) == main(t) &&
          java.lang.Long.bitCount(probe(2 * t) ^ probe(2 * t + 1)) == 1 &&
          // depth-T layout: main + T single-bit flips, all bits distinct,
          // and the first flip equals depth-1's (prefix property)
          deep(4 * t) == main(t) &&
          deep(4 * t + 1) == probe(2 * t + 1) &&
          (1 to 3).forall(r => java.lang.Long.bitCount(deep(4 * t) ^ deep(4 * t + r)) == 1) &&
          (1 to 3).map(r => deep(4 * t) ^ deep(4 * t + r)).distinct.size == 3
      }
    }
  }

  property("npy header: dump-format text round-trips through parseHeader") =
    forAll(Gen.chooseNum(1L, 10000L), Gen.chooseNum(1L, 512L),
        Gen.oneOf("<f4", "<f8", "<i4", "<i8")) { (n, d, dt) =>
      val txt = s"{'descr': '$dt', 'fortran_order': False, 'shape': ($n, $d), }\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
      bos.write(Array[Byte]((txt.length & 0xff).toByte, (txt.length >> 8).toByte))
      bos.write(txt.getBytes("ISO-8859-1"))
      val h = graft.sources.Npy.parseHeader(bos.toByteArray)
      h.descr == dt && h.shape == Seq(n, d) &&
        h.rowBytes == d * dt.drop(2).toInt && h.dataOffset == 10 + txt.length
    }
}
