package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** Runs [[StoreLifecycleCheck]] in a SEPARATE JVM: the one lifecycle shape
  * an in-suite test cannot exercise (the suite's shared SparkContext must
  * survive), and exactly the shape a warehouse runs — the process that
  * wrote the index store is gone when the probing process starts. The
  * child classpath is the same unmanaged layout build.sbt declares
  * (/opt/spark/jars + the compiled classes), so the check runs the code
  * under test, not a stale artifact.
  */
class StoreLifecycleSpec extends AnyFunSuite {

  // JavaModuleOptions.defaultModuleOptions() — same list as build.sbt
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("index store written by one process is probed exactly by a new one") {
    val classes = new File("target/scala-2.13/classes")
    assert(classes.isDirectory, s"compiled classes not at ${classes.getAbsolutePath}")
    val cp = s"${classes.getAbsolutePath}:/opt/spark/jars/*"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_store_lifecycle_${System.nanoTime()}").getAbsolutePath

    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", cp,
      "-Dspark.ui.enabled=false",
      "graft.StoreLifecycleCheck", root)
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .foreach(l => out.append(l).append('\n'))
    val exit = proc.waitFor()
    val tail = out.toString.linesIterator.toSeq.takeRight(25).mkString("\n")
    assert(exit == 0, s"StoreLifecycleCheck exited $exit; output tail:\n$tail")
    assert(out.toString.contains("store-lifecycle OK"), s"missing OK marker:\n$tail")
    assert(out.toString.contains("media-store-lifecycle OK"),
      s"missing media OK marker:\n$tail")
    assert(out.toString.contains("acid-lifecycle OK"),
      s"missing acid OK marker:\n$tail")
  }
}
