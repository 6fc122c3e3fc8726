package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[ExtensionProbe]] in a FRESH JVM: the declarative
  * `spark.sql.extensions=graft.GraftExtensions` deployment (the shape a
  * shared cluster uses — no imperative registration anywhere) must supply
  * the SQL functions, the as-of planner strategy, and the pushdown rules.
  * Forked because extensions bind at session construction and the
  * suite-wide session already exists without them.
  */
class ExtensionSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions wires functions, strategy, rules") {
    val cp = Seq(
      "target/scala-2.13/classes",
      "target/scala-2.13/test-classes",
      "/opt/spark/jars/*").mkString(":")
    val pb = new ProcessBuilder("java", "-cp", cp,
      "-Xmx2g", "graft.ExtensionProbe")
    pb.directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assert(code == 0 && out.contains("EXTENSION_OK"),
      s"extension probe failed (exit $code):\n${out.takeRight(4000)}")
  }
}
