package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.QuantizeI8
import graft.io.Config

/** Property-based checks of the pure kernels — the invariants hold for
  * ARBITRARY generated inputs, not just the fixtures the example-based
  * specs pin. Generators are driven from fixed seeds, so failures are
  * reproducible.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sample stream from a Gen (no scalatestplus bridge in
    * the offline cache — drive scalacheck directly).
    */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n * 3).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  // ---- int8 quantization ---------------------------------------------------

  private val finiteD = Gen.chooseNum(-1e6, 1e6)
  private val vecGen = Gen.nonEmptyListOf(finiteD).map(_.toArray)

  test("quantize: every code in [-127,127]; reconstruction within half a step") {
    samples(vecGen).foreach { v =>
      val row = QuantizeI8.quantize(new GenericArrayData(v))
      val scale = row.getDouble(0)
      val q = row.getArray(1)
      assert(scale === v.map(math.abs).foldLeft(0.0)(math.max))
      (0 until q.numElements()).foreach { i =>
        val b = q.getByte(i)
        assert(b >= -127 && b <= 127)
        if (scale > 0) {
          val rec = b.toDouble * scale / 127.0
          // half a quantization step, plus FP slack
          assert(math.abs(rec - v(i)) <= scale / 254.0 * (1 + 1e-9) + 1e-12,
            s"component $i: ${v(i)} -> $b -> $rec (scale $scale)")
        } else assert(b === 0)
      }
    }
  }

  test("quantize: sign preserved (nonzero components never flip sign)") {
    samples(vecGen).foreach { v =>
      val row = QuantizeI8.quantize(new GenericArrayData(v))
      val scale = row.getDouble(0)
      val q = row.getArray(1)
      if (scale > 0) (0 until q.numElements()).foreach { i =>
        val b = q.getByte(i).toDouble
        assert(b * v(i) >= 0.0, s"sign flip at $i: ${v(i)} -> $b")
      }
    }
  }

  // ---- config parser -------------------------------------------------------

  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val valGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', '-', '/')))
      .map(_.mkString)

  test("config: flat key/value pairs round-trip for arbitrary identifiers") {
    samples(Gen.nonEmptyMap(Gen.zip(keyGen, valGen)), n = 100).foreach { kv =>
      val text = kv.map { case (k, v) => s"$k: $v" }.mkString("\n")
      assert(Config.parse(text, env = Map.empty) === kv)
    }
  }

  test("config: two-level nesting flattens to dotted paths for arbitrary keys") {
    samples(Gen.zip(keyGen, keyGen, valGen), n = 100).foreach { case (outer, inner, v) =>
      val parsed = Config.parse(s"$outer:\n  $inner: $v", env = Map.empty)
      assert(parsed === Map(s"$outer.$inner" -> v))
    }
  }

  test("config: block sequences index items in order for arbitrary item counts") {
    samples(Gen.zip(keyGen, Gen.nonEmptyListOf(valGen)), n = 100).foreach { case (key, items) =>
      val text = s"$key:\n" + items.map(i => s"  - $i").mkString("\n")
      val parsed = Config.parse(text, env = Map.empty)
      assert(parsed === items.zipWithIndex.map { case (v, i) => s"$key.$i" -> v }.toMap)
    }
  }

  // ---- interpolation -------------------------------------------------------

  test("interpolate: set vars always win over defaults; unset fall back") {
    samples(Gen.zip(keyGen, valGen, valGen), n = 100).foreach { case (name, set, dflt) =>
      assert(Config.interpolate(s"$${$name:$dflt}", Map(name -> set)) === set)
      assert(Config.interpolate(s"$${$name:$dflt}", Map.empty) === dflt)
      assert(Config.interpolate(s"$${$name}", Map.empty) === "")
    }
  }
}
