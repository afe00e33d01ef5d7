package graft.io

/** Mirrors reference config tests (reference: tests/ketl/test_config.py). */
class ConfigSpec extends graft.SparkSpec {

  test("env interpolation with and without defaults") {
    val env = Map("NEO4J_PASSWORD" -> "s3cret")
    assert(Config.interpolate("pwd: ${NEO4J_PASSWORD}", env) === "pwd: s3cret")
    assert(Config.interpolate("uri: ${MISSING:bolt://localhost:7687}", env)
      === "uri: bolt://localhost:7687")
    assert(Config.interpolate("x: ${MISSING}", env) === "x: ")
  }

  test("nested keys flatten to dotted paths") {
    val conf = Config.parse(
      """# comment
        |spark:
        |  master: local[2]
        |  appName: graft-test-cfg
        |  config:
        |    spark.ui.enabled: "false"
        |neo4j:
        |  uri: ${GRAFT_NEO:bolt://localhost:7687}
        |""".stripMargin, env = Map.empty)
    assert(conf("spark.master") === "local[2]")
    assert(conf("spark.appName") === "graft-test-cfg")
    assert(conf("spark.config.spark.ui.enabled") === "false")
    assert(conf("neo4j.uri") === "bolt://localhost:7687")
  }

  test("sparkSession builder consumes master/appName/config entries") {
    spark // force the shared test session so getOrCreate below reuses it
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val s = Config.sparkSession(Map(
        "master" -> "local[2]", "appName" -> "graft-cfg",
        "config.spark.sql.shuffle.partitions" -> "2"))
      assert(s.sparkContext.isLocal)
      // getOrCreate applied the config entry to the (shared) session
      assert(s.conf.get("spark.sql.shuffle.partitions") === "2")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
