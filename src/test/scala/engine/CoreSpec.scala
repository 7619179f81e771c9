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
