package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** Runs [[StreamingCheck]] in a SEPARATE JVM against the sf0.001 fixture:
  * the real `readStream` file-source entry point, micro-batch planning via
  * AvailableNow + maxFilesPerTrigger, memory/file sinks — driven exactly as
  * a deployment would, not through the suite's shared session. The child
  * classpath is the same unmanaged layout build.sbt declares
  * (/opt/spark/jars + the compiled classes).
  */
class StreamingCheckSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("file-source readStream twins of q_strm1-3 / S-STRM8 equal their batch results") {
    val sfDir = new File("/root/testdata/sf0.001")
    assume(sfDir.isDirectory, s"fixture dir ${sfDir.getAbsolutePath} not present")
    val classes = new File("target/scala-2.13/classes")
    assert(classes.isDirectory, s"compiled classes not at ${classes.getAbsolutePath}")
    val cp = s"${classes.getAbsolutePath}:/opt/spark/jars/*"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val scratch = new File(System.getProperty("java.io.tmpdir"),
      s"graft_streaming_check_${System.nanoTime()}").getAbsolutePath

    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", cp,
      "-Dspark.ui.enabled=false",
      "graft.StreamingCheck", sfDir.getAbsolutePath, scratch)
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .foreach(l => out.append(l).append('\n'))
    val exit = proc.waitFor()
    val tail = out.toString.linesIterator.toSeq.takeRight(25).mkString("\n")
    assert(exit == 0, s"StreamingCheck exited $exit; output tail:\n$tail")
    for (marker <- Seq("q_strm1(tumblingHourly) OK", "q_strm2(slidingHourly) OK",
        "q_strm3(sessionized) OK", "S-STRM8(driftMonitor) OK", "sinkPartitioned OK"))
      assert(out.toString.contains(marker), s"missing marker '$marker':\n$tail")
  }
}
