package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Staleness guard for tmp-dir staged copies (bucketed/partitioned/
  * format fixtures). A bare `_SUCCESS` check survives JVM restarts AND
  * source regeneration — this repo has already been bitten once by
  * testdata regenerating under a cached assumption (the r3 ts-encoding
  * desync) — so staged layouts additionally record a stamp of the
  * SOURCE file identity (length + mtime) and re-stage whenever it no
  * longer matches. */
object Staging {

  private def stampOf(source: File): String =
    s"${source.length}:${source.lastModified}"

  /** True when `stagedDir` holds a complete copy staged from the
    * CURRENT `source` (both `_SUCCESS` and a matching source stamp). */
  private[graft] def isFresh(stagedDir: String, source: String): Boolean = {
    val stamp = new File(s"$stagedDir/_GRAFT_SRC_STAMP")
    new File(s"$stagedDir/_SUCCESS").exists() && stamp.exists() &&
      new String(Files.readAllBytes(stamp.toPath), StandardCharsets.UTF_8) ==
        stampOf(new File(source))
  }

  /** Record the source stamp after a successful staging write. */
  private[graft] def markStaged(stagedDir: String, source: String): Unit =
    Files.write(Paths.get(s"$stagedDir/_GRAFT_SRC_STAMP"),
      stampOf(new File(source)).getBytes(StandardCharsets.UTF_8))
}
