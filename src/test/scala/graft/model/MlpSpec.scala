package graft.model

import org.scalatest.funsuite.AnyFunSuite

class MlpSpec extends AnyFunSuite {

  test("init is seed-deterministic and bounded by 1/sqrt(fan_in)") {
    val a = Mlp.init(7)
    val b = Mlp.init(7)
    assert(a.flatten.sameElements(b.flatten))
    assert(!Mlp.init(8).flatten.sameElements(a.flatten))
    val k0 = 1.0 / math.sqrt(Mlp.dims(0).toDouble)
    assert(a.w(0).flatten.forall(x => x >= -k0 && x <= k0))
  }

  test("flatten/unflatten round-trips") {
    val w = Mlp.init(3)
    assert(Mlp.unflatten(w.flatten).flatten.sameElements(w.flatten))
  }

  test("forward matches a hand-computed tiny net") {
    // 2 -> 2 (ReLU) -> 1:  h = relu(W1 x + b1), y = W2 h + b2
    val w = Mlp.Weights(
      Vector(Array(Array(1.0, -1.0), Array(0.5, 0.5)), Array(Array(2.0, -3.0))),
      Vector(Array(0.0, -1.0), Array(0.25)))
    val y = Mlp.forward(w, Array(3f, 1f))
    // h1 = relu(3-1+0)=2 ; h2 = relu(1.5+0.5-1)=1 ; y = 2*2 - 3*1 + 0.25 = 1.25
    assert(math.abs(y(0) - 1.25f) < 1e-6)
    // negative pre-activation is clamped
    val y2 = Mlp.forward(w, Array(-3f, -1f))
    // h1 = relu(-3+1)=0 ; h2 = relu(-1.5-0.5-1)=0 ; y = 0.25
    assert(math.abs(y2(0) - 0.25f) < 1e-6)
  }

  test("fedAvg is the sample-weighted mean (similarity_search.py:476-493)") {
    def const(v: Double) = Mlp.Weights(
      Vector(Array(Array(v, v))), Vector(Array(v)))
    val avg = Mlp.fedAvg(Seq((const(1.0), 100L), (const(4.0), 300L)))
    // (1*100 + 4*300)/400 = 3.25
    assert(avg.flatten.forall(x => math.abs(x - 3.25) < 1e-12))
  }

  test("localFit reduces the Gram-reconstruction loss (M2 behavioral parity)") {
    val rng = new scala.util.Random(1)
    val x = Array.fill(64)(Array.fill(4)(rng.nextGaussian()))
    val start = Mlp.Weights(
      Vector(
        Array.fill(8, 4)((rng.nextDouble() * 2 - 1) * 0.5),
        Array.fill(3, 8)((rng.nextDouble() * 2 - 1) * 0.35)),
      Vector(Array.fill(8)(0.0), Array.fill(3)(0.0)))
    val (_, losses) = Mlp.localFit(start, x, epochs = 30, batchSize = 32, lr = 1e-2)
    assert(losses.nonEmpty)
    assert(losses.last < losses.head,
      s"loss did not decrease: ${losses.head} -> ${losses.last}")
  }

  test("backprop direction agrees with the numerical gradient") {
    // one Adam step ≈ -lr·sign(g) (bias-corrected first moment at t=1),
    // so each weight must move OPPOSITE the numerical gradient's sign
    val rng = new scala.util.Random(5)
    val x = Array.fill(8)(Array.fill(4)(rng.nextGaussian()))
    val start = Mlp.Weights(
      Vector(
        Array.fill(6, 4)((rng.nextDouble() * 2 - 1) * 0.5),
        Array.fill(2, 6)((rng.nextDouble() * 2 - 1) * 0.4)),
      Vector(Array.fill(6)(0.1), Array.fill(2)(-0.1)))
    val (after, _) = Mlp.localFit(start, x, epochs = 1, batchSize = 8, lr = 1e-4)
    val flatBefore = start.flatten
    val flatAfter = after.flatten

    val eps = 1e-3
    var checked = 0
    var agree = 0
    (0 until flatBefore.length by 3).foreach { i =>
      val plus = flatBefore.clone(); plus(i) += eps
      val minus = flatBefore.clone(); minus(i) -= eps
      val numG = (Mlp.lossOf(Mlp.unflattenLike(start, plus), x) -
        Mlp.lossOf(Mlp.unflattenLike(start, minus), x)) / (2 * eps)
      if (math.abs(numG) > 1e-3) {
        checked += 1
        val step = flatAfter(i) - flatBefore(i)
        if (math.signum(step) == -math.signum(numG)) agree += 1
      }
    }
    assert(checked > 10, s"too few significant coordinates ($checked)")
    assert(agree.toDouble / checked >= 0.9,
      s"gradient sign agreement ${agree.toDouble / checked} ($agree/$checked)")
  }

  test("localFit on empty shard is a no-op") {
    val w = Mlp.init(1)
    val (out, losses) = Mlp.localFit(w, Array.empty, epochs = 2)
    assert(out.flatten.sameElements(w.flatten) && losses.isEmpty)
  }
}
