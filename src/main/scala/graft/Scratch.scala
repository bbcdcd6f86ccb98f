package graft

/** Recursive scratch-directory delete — ONE definition for every
  * cleanup path (query-internal scratch reclaim, streaming drain
  * checkpoints, Verify's output reset). Silent on missing paths;
  * deletion failures are non-fatal by design (scratch lives under
  * tmp roots the OS reclaims). */
private[graft] object Scratch {
  def deleteRecursively(f: java.io.File): Unit = {
    // never recurse THROUGH a symlink: listFiles() resolves links, so
    // a linked directory inside a scratch tree would otherwise have
    // its TARGET's contents deleted — unlink the link itself instead
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }
}
