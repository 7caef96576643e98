package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ConfigLoaderSpec extends AnyFunSuite with Matchers {

  private val refYaml = "/root/reference/test/test_experiment/config/candia.yaml"

  test("parses flat yaml with quotes, comments, env vars") {
    val m = ConfigLoader.parseFlatYaml(
      """---
        |a: "hello"  # trailing comment
        |b: 42
        |# full comment
        |c:  'single'
        |d: $HOME_TEST/x
        |""".stripMargin, env = Map("HOME_TEST" -> "/root"))
    m("a") shouldBe "hello"
    m("b") shouldBe "42"
    m("c") shouldBe "single"
    m("d") shouldBe "/root/x"
  }

  test("loads the reference toy config with its exact values") {
    assume(new java.io.File(refYaml).isFile)
    val cfg = ConfigLoader.load(refYaml)
    cfg.minScanIntensity shouldBe 1.0
    cfg.windowSizeSec shouldBe 60.0
    cfg.massTolPpm shouldBe 40.0
    cfg.parafacMinComp shouldBe 10
    cfg.parafacMaxComp shouldBe 14
    cfg.parafacMaxIter shouldBe 5000
    cfg.avgPeakFwhmSec shouldBe 12.0
  }
}
