package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Write -> reload-in-a-FRESH-session -> probe must equal the in-memory
  * build exactly, for all three index families — the full on-disk
  * lifecycle the incremental operators assume. */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val emb = (0 until 60)
    .map(i => (i.toLong, i % 3, Array.fill(16)(rnd.nextGaussian().toFloat)))
    .toDF("vec_id", "label", "embedding")
    .localCheckpoint()

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("LSH band store: reload equals build; incremental candidates from the reload match") {
    val root = Files.createTempDirectory("graft_store_bands").toString
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again " * 3),
      (1L, "completely different content about columnar query engines io " * 3),
      (2L, "the quick brown fox jumps over the lazy dog again and again " * 3))
      .toDF("doc_id", "text")
    val oldBands = NearDup.lshBandTable(docs.where(col("doc_id") < 2), "doc_id", col("text"))
    IndexStore.writeLshBands(oldBands, root)
    val fresh = spark.newSession()
    val reloaded = IndexStore.readLshBands(fresh, root)
    assert(rows(reloaded) === rows(oldBands))
    val newBands = NearDup.lshBandTable(docs.where(col("doc_id") === 2), "doc_id", col("text"))
    val viaStore = NearDup.incrementalLshCandidates(newBands, reloaded)
    val viaMemory = NearDup.incrementalLshCandidates(newBands, oldBands)
    assert(rows(viaStore) === rows(viaMemory))
    assert(rows(viaStore).contains(Seq(0L, 2L)), "dup of stored doc 0 must be found")
  }

  test("fresh-PROCESS lifecycle: a separate JVM cold-reads the band store and dedups against it") {
    // the true warehouse lifecycle — write in THIS application, serve in a
    // NEW one: fork a second JVM (own SparkContext, cold classloader, no
    // shared session state) running graft.StoreProbeMain, which reloads
    // the store and must find the planted duplicate of an indexed doc
    val root = Files.createTempDirectory("graft_store_xproc").toString
    val dupText = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = Seq((0L, dupText),
      (1L, "completely different content about columnar query engines io " * 3))
      .toDF("doc_id", "text")
    val bands = NearDup.lshBandTable(docs, "doc_id", col("text"))
    IndexStore.writeLshBands(bands, root)
    val nBands = bands.count()
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"),
      "graft.StoreProbeMain", root, nBands.toString, "7", dupText)
    val exit = scala.sys.process.Process(cmd).!
    assert(exit === 0, s"fresh-process probe failed with exit $exit")
  }

  test("IVF store: probe and incremental assignment from the reload equal in-memory") {
    val root = Files.createTempDirectory("graft_store_ivf").toString
    val (indexed, centers) = IvfAnn.buildIndex(emb, "embedding", numClusters = 4)
    IndexStore.writeIvf(indexed, centers, root)
    val fresh = spark.newSession()
    val (ri, rc) = IndexStore.readIvf(fresh, root)
    assert(rows(ri.select("vec_id", "__cluster")) === rows(indexed.select("vec_id", "__cluster")))
    val q = emb.where(col("vec_id") === 0)
    val inMem = IvfAnn.probe(indexed, centers, "vec_id", "embedding", q, "embedding", 5, 2)
    val stored = IvfAnn.probe(ri, rc, "vec_id", "embedding", q, "embedding", 5, 2)
    assert(rows(stored) === rows(inMem))
    val batch = emb.where(col("vec_id") % 7 === 0)
    assert(rows(IvfAnn.assignToIndex(batch, "vec_id", "embedding", rc)
             .select("vec_id", "__cluster")) ===
           rows(IvfAnn.assignToIndex(batch, "vec_id", "embedding", centers)
             .select("vec_id", "__cluster")))
  }

  test("PQ store: ADC probe from the reload equals in-memory") {
    val root = Files.createTempDirectory("graft_store_pq").toString
    val books = PqAnn.fitCodebooks(emb, "embedding", dim = 16, m = 4, k = 8)
    val codes = PqAnn.encode(emb, "vec_id", "embedding", books, dim = 16, m = 4)
    IndexStore.writePq(books, codes, root)
    val fresh = spark.newSession()
    val (rb, rcodes) = IndexStore.readPq(fresh, root)
    assert(rows(rcodes) === rows(codes))
    val q = emb.where(col("vec_id") === 0)
    val inMem = PqAnn.probe(codes, books, "vec_id", q, "embedding", dim = 16, m = 4, k = 5)
    val stored = PqAnn.probe(rcodes, rb, "vec_id", q, "embedding", dim = 16, m = 4, k = 5)
    assert(rows(stored) === rows(inMem))
  }
}
