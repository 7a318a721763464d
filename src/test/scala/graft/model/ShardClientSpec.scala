package graft.model

import org.scalatest.funsuite.AnyFunSuite

class ShardClientSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(3)
  private val data = Array.fill(64)(Array.fill(20)(rng.nextGaussian()))
  private val client = ShardClient("H_A", data)

  test("parameters round-trip through the client surface") {
    val w = Mlp.init(5)
    assert(client.setParameters(client.getParameters(w)).flatten
      .sameElements(w.flatten))
  }

  test("fit returns (params, n, loss) and training moves parameters") {
    val start = Mlp.init(5).flatten
    val (after, n, loss) = client.fit(start, localEpochs = 2)
    assert(n == 64)
    assert(!loss.isNaN && loss > 0)
    assert(!after.sameElements(start))
  }

  test("evaluate returns positive embedding variance (M5)") {
    val (variance, n) = client.evaluate(Mlp.init(5).flatten)
    assert(variance > 0 && n == 64)
  }
}
