package graft.sources

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** A third-party FS that never overrode FileSystem.getScheme — the
  * Hadoop base class throws UnsupportedOperationException there, which
  * must not take down scheme-keyed fast paths (commit-store resolution,
  * streaming position publishes). */
class SchemelessFileSystem extends RawLocalFileSystem {
  override def getScheme: String =
    throw new UnsupportedOperationException("Not implemented by this FS")
  override def getUri: URI = URI.create("file:///")
}

class FsSchemeSpec extends AnyFunSuite {

  private def schemeless(): SchemelessFileSystem = {
    val f = new SchemelessFileSystem
    f.initialize(URI.create("file:///"), new Configuration())
    f
  }

  test("schemeOf falls back to the FS URI when getScheme throws") {
    assert(CommitStore.schemeOf(schemeless()) == "file")
  }

  test("commit-store resolution survives a throwing getScheme") {
    assert(CommitStore.forFs(schemeless()) == LinkCommitStore)
  }

  test("streaming position publish/read survives a throwing getScheme") {
    val f = schemeless()
    val dir = Files.createTempDirectory("fsscheme").toString
    val p = new Path(dir, "graft-position")
    SchemaTracking.writeFile(f, p, """{"v":1}""")
    assert(SchemaTracking.readFile(f, p).contains("""{"v":1}"""))
    // atomic republish over an existing file (the REPLACE_EXISTING path)
    SchemaTracking.writeFile(f, p, """{"v":2}""")
    assert(SchemaTracking.readFile(f, p).contains("""{"v":2}"""))
  }
}
