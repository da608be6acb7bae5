package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property laws for the PQ kernels (SURVEY.md §5 ScalaCheck convention) —
  * the algebra the gate's planted construction cannot cover: encode is
  * the per-sub-space argmin (checked against a brute-force test-side
  * reimplementation), ADC is the separable sum of table entries, and —
  * the optimality law ADC retrieval rests on — encode(q) minimizes
  * ADC(q, ·) over EVERY possible code, because the objective decomposes
  * per sub-space. */
object PqPropsSuite extends Properties("pq-kernels") {

  private def a1(xs: Array[Double]): ArrayData = new GenericArrayData(xs)
  private def a2(xs: Array[Array[Double]]): ArrayData =
    new GenericArrayData(xs.map(a1(_): Any))
  private def a3(xs: Array[Array[Array[Double]]]): ArrayData =
    new GenericArrayData(xs.map(a2(_): Any))

  private val valGen: Gen[Double] = Gen.chooseNum(-5.0, 5.0)

  /** (m, k, subDim, codebook, vector) with vector length = m·subDim. */
  private val cbVecGen: Gen[(Int, Int, Int, Array[Array[Array[Double]]], Array[Double])] =
    for {
      m <- Gen.choose(1, 4)
      k <- Gen.choose(1, 8)
      subDim <- Gen.choose(1, 4)
      cb <- Gen.listOfN(m, Gen.listOfN(k, Gen.listOfN(subDim, valGen)))
      v <- Gen.listOfN(m * subDim, valGen)
    } yield (m, k, subDim,
      cb.map(_.map(_.toArray).toArray).toArray, v.toArray)

  private def l2(a: Array[Double], b: Array[Double], off: Int): Double = {
    var d = 0.0; var j = 0
    while (j < a.length) { val t = a(j) - b(off + j); d += t * t; j += 1 }
    d
  }

  property("encode byte s is the brute-force argmin of sub-space s") =
    forAll(cbVecGen) { case (m, k, subDim, cb, v) =>
      val code = PqKernels.pqEncode(a3(cb), a1(v))
      code != null && code.length == m && (0 until m).forall { s =>
        val dists = cb(s).map(c => l2(c, v, s * subDim))
        val expect = dists.indices.minBy(i => (dists(i), i))
        (code(s) & 0xFF) == expect
      }
    }

  property("table entry (s,j) is L2² of the query sub-vector to centroid j") =
    forAll(cbVecGen) { case (m, k, subDim, cb, v) =>
      val t = PqKernels.pqTable(a3(cb), a1(v))
      t != null && (0 until m).forall { s =>
        (0 until k).forall { j =>
          math.abs(t.getDouble(s * k + j) - l2(cb(s)(j), v, s * subDim)) < 1e-9
        }
      }
    }

  property("ADC of a code is the separable sum; encode(x) scores the reconstruction distance") =
    forAll(cbVecGen) { case (m, k, subDim, cb, q) =>
      val code = PqKernels.pqEncode(a3(cb), a1(q))
      val t = PqKernels.pqTable(a3(cb), a1(q))
      val adc = PqKernels.pqAdc(t, code, k)
      val direct = (0 until m).map(s => l2(cb(s)(code(s) & 0xFF), q, s * subDim)).sum
      math.abs(adc - direct) < 1e-9
    }

  property("encode(q) minimizes ADC(q, ·) over every possible code") =
    forAll(cbVecGen, Gen.listOfN(4, Gen.choose(0, 255))) {
      case ((m, k, subDim, cb, q), rnd) =>
        val t = PqKernels.pqTable(a3(cb), a1(q))
        val best = PqKernels.pqAdc(t, PqKernels.pqEncode(a3(cb), a1(q)), k)
        val other = Array.tabulate(m)(s => (rnd(s % rnd.length) % k).toByte)
        best <= PqKernels.pqAdc(t, other, k) + 1e-12
    }

  property("argMinL2 first-min tie-break: duplicated centroids keep the lowest index") =
    forAll(cbVecGen) { case (m, k, subDim, cb, v) =>
      // duplicate every centroid list: argmin must land in the first half
      val dup = cb(0) ++ cb(0)
      val ix = PqKernels.argMinL2(a2(dup), a1(v.take(subDim)))
      ix < k
    }

  property("NULL contracts: ragged vectors and cross-geometry codes never mis-score") =
    forAll(cbVecGen) { case (m, k, subDim, cb, v) =>
      val ragged = PqKernels.pqEncode(a3(cb), a1(v :+ 1.0))
      val t = PqKernels.pqTable(a3(cb), a1(v))
      // a code one byte longer than m does not match the m·k table
      val wrong = new Array[Byte](m + 1)
      ragged == null && java.lang.Double.isNaN(PqKernels.pqAdc(t, wrong, k))
    }
}
