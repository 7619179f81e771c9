package engine

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Pins Core.publishOnce's locking contract (r3 advisor): same-dir
  * publishes serialize and write exactly once; publishes of UNRELATED
  * dirs overlap instead of queueing on a global monitor; a failed
  * produce step deletes its temp dir and leaves no published marker. */
class CoreSpec extends AnyFunSuite {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_corespec_$tag").toFile.getPath + "/pub"

  private def cleanup(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
    rm(new java.io.File(dir + ".lock"))
    Option(new java.io.File(dir).getParentFile).foreach(rm)
  }

  test("same-dir concurrent publishes write exactly once") {
    val dir = freshDir("same")
    val writes = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = Core.publishOnce(dir) { tmp =>
            writes.incrementAndGet()
            new java.io.File(tmp).mkdirs()
            Files.writeString(java.nio.file.Paths.get(tmp, "data"), "x")
            Files.writeString(java.nio.file.Paths.get(tmp, "_SUCCESS"), "")
          }
        })
      }
      tasks.foreach(_.get(30, TimeUnit.SECONDS))
      // the monitor serializes same-dir publishes, and every later entrant
      // sees the _SUCCESS marker and skips its write entirely
      assert(writes.get() == 1, s"expected 1 write, got ${writes.get()}")
      assert(new java.io.File(dir, "_SUCCESS").exists())
    } finally { pool.shutdownNow(); cleanup(dir) }
  }

  test("unrelated-dir publishes overlap (no global serialization)") {
    val dirA = freshDir("a"); val dirB = freshDir("b")
    // both writers must be INSIDE their produce step at the same moment —
    // impossible under the old JVM-global synchronized publishOnce
    val bothIn = new CountDownLatch(2)
    val release = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def writer(dir: String) = pool.submit(new Runnable {
      def run(): Unit = Core.publishOnce(dir) { tmp =>
        bothIn.countDown()
        assert(release.await(10, TimeUnit.SECONDS),
          "peer publish never entered its produce step — publishes of " +
            "unrelated dirs are serializing")
        new java.io.File(tmp).mkdirs()
        Files.writeString(java.nio.file.Paths.get(tmp, "_SUCCESS"), "")
      }
    })
    try {
      val fa = writer(dirA); val fb = writer(dirB)
      assert(bothIn.await(10, TimeUnit.SECONDS),
        "publishes of unrelated dirs did not overlap")
      release.countDown()
      fa.get(30, TimeUnit.SECONDS); fb.get(30, TimeUnit.SECONDS)
      assert(new java.io.File(dirA, "_SUCCESS").exists())
      assert(new java.io.File(dirB, "_SUCCESS").exists())
    } finally { pool.shutdownNow(); cleanup(dirA); cleanup(dirB) }
  }

  test("failed produce step strands no temp dir and publishes nothing") {
    val dir = freshDir("fail")
    val parent = new java.io.File(dir).getParentFile
    try {
      intercept[RuntimeException] {
        Core.publishOnce(dir) { tmp =>
          new java.io.File(tmp).mkdirs()
          Files.writeString(java.nio.file.Paths.get(tmp, "partial"), "x")
          throw new RuntimeException("synthetic write failure")
        }
      }
      assert(!new java.io.File(dir).exists(), "failed publish left the dir")
      val leftovers = Option(parent.listFiles()).toSeq.flatten
      assert(leftovers.isEmpty,
        s"failed publish stranded: ${leftovers.map(_.getName).toSeq}")
      // a later publish of the same dir succeeds normally
      Core.publishOnce(dir) { tmp =>
        new java.io.File(tmp).mkdirs()
        Files.writeString(java.nio.file.Paths.get(tmp, "_SUCCESS"), "")
      }
      assert(new java.io.File(dir, "_SUCCESS").exists())
    } finally cleanup(dir)
  }

  test("persistKeyed evicts coldest-first past the declared cap and " +
      "re-derives on next read (r20 verdict item 7)") {
    val spark = gps.TestSpark.spark
    import spark.implicits._
    val capKey = "spark.graft.keyed.capBytes"
    val prev = spark.conf.getOption(capKey)
    try {
      // cap ABOVE any plausible test footprint first: both frames must
      // coexist so the eviction below is attributable to the cap change
      spark.conf.set(capKey, (64L << 30).toString)
      ScratchCache.drainBuiltLog()
      val a = ScratchCache.persistKeyed("corespec_lru_a")(
        Seq(1, 2, 3).toDF("x"))
      a.count() // materialize so the storage accounting sees its blocks
      val b = ScratchCache.persistKeyed("corespec_lru_b")(
        Seq(4, 5).toDF("x"))
      b.count()
      assert(ScratchCache.drainBuiltLog()
        .count(_.startsWith("corespec_lru_")) == 2)
      assert(a.storageLevel.useMemory && b.storageLevel.useMemory)
      // a HIT never re-derives (the by-name builder must not run)
      val b2 = ScratchCache.persistKeyed("corespec_lru_b")(
        sys.error("hit must not re-derive"))
      assert(b2.storageLevel.useMemory)
      // 1-byte cap: the next INSERT must evict coldest-first — `a` then
      // `b` (LRU order after the hit bump) go; the inserted key itself
      // survives (the newest always does)
      spark.conf.set(capKey, "1")
      val c = ScratchCache.persistKeyed("corespec_lru_c")(
        Seq(6).toDF("x"))
      c.count()
      assert(c.storageLevel.useMemory, "the newest entry must survive")
      assert(!a.storageLevel.useMemory, "coldest entry must be evicted")
      assert(!b.storageLevel.useMemory, "older entries evict before newest")
      // an evicted key re-derives from its builder on the next read
      spark.conf.set(capKey, (64L << 30).toString)
      ScratchCache.drainBuiltLog()
      ScratchCache.persistKeyed("corespec_lru_a")(Seq(9).toDF("x")): Unit
      assert(ScratchCache.drainBuiltLog().contains("corespec_lru_a"))
    } finally prev match {
      case Some(v) => spark.conf.set(capKey, v)
      case None => spark.conf.unset(capKey)
    }
  }

  test("boundedCollect returns within-bound rows and throws past the " +
      "declared bound (r15 verdict item 8)") {
    val spark = gps.TestSpark.spark
    import spark.implicits._
    val ds = spark.range(10).as[Long]
    assert(Core.boundedCollect(ds, 10, "ok").sorted == (0L until 10))
    val ex = intercept[IllegalArgumentException] {
      Core.boundedCollect(ds, 9, "overflow-probe")
    }
    assert(ex.getMessage.contains("overflow-probe"))
  }
}
