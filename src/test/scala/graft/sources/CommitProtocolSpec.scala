package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.SyntheticWeb
import graft.operators.Crawler
import graft.plans.Model.CrawlConfig

/** The snapshot-visibility seam: SnapshotStore must route ALL publication
  * through its CommitProtocol (swapping the backend = swapping the trait,
  * no crawl code changes), and the posix implementation must uphold the
  * invariants the object-store variant is specified against. */
class CommitProtocolSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(): Path = Files.createTempDirectory("graft-protocol")

  test("every snapshot publication goes through the injected protocol") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val recording = new CommitProtocol {
      override def publish(root: Path, staged: Path, k: Int): Unit = {
        seen += k
        PosixRenameCommit.publish(root, staged, k)
      }
    }
    val root = tmp()
    val store = new SnapshotStore(spark, root.toString, recording)
    Crawler.run(spark, store, SyntheticWeb.seeds(5), rounds = 2,
      CrawlConfig(roundCap = 50))
    // init (snapshot 0) + two rounds (snapshots 1, 2), in order
    assert(seen.toList == List(0, 1, 2))
    assert(store.head.contains(2))
  }

  test("posix publish is all-or-nothing: a staged dir is invisible until publish") {
    val root = tmp()
    val store = new SnapshotStore(spark, root.toString)
    val pending = store.begin(0)
    Files.writeString(java.nio.file.Paths.get(pending.pagesPath), "x")
    // nothing published yet: no HEAD, no snapshot dir
    assert(store.head.isEmpty)
    assert(!store.exists(0))
    pending.commit("""{"round":-1}""")
    assert(store.head.contains(0))
    assert(store.manifest(0).contains("""{"round":-1}"""))
    // staging dir is gone (renamed, not copied)
    assert(!Files.exists(root.resolve(".tmp-0")))
  }

  test("abort leaves no trace and a re-begin reclaims a stale staging dir") {
    val root = tmp()
    val store = new SnapshotStore(spark, root.toString)
    val p1 = store.begin(3)
    Files.writeString(java.nio.file.Paths.get(p1.pagesPath), "stale")
    p1.abort()
    assert(!Files.exists(root.resolve(".tmp-3")))
    // simulate a crash: stage again, "die", then a retry's begin reclaims
    val p2 = store.begin(3)
    Files.writeString(java.nio.file.Paths.get(p2.pagesPath), "crashed")
    val p3 = store.begin(3)
    assert(!Files.exists(java.nio.file.Paths.get(p3.pagesPath)))
    p3.abort()
  }
}
