package graft.util

/** Repo-state stamps for bench artifacts (r14 verdict: the committed
  * sweeps predated final HEAD by one product-source refactor, and the
  * freeze gate could not see it — key-set equality was intact). Every
  * sweep artifact records the HEAD SHA it was generated at, and the
  * freeze tier of ArtifactSyncSpec asserts that NO product source
  * (src/main) changed between that SHA and the current HEAD — making
  * "one perf-neutral refactor after regeneration" a failing test
  * instead of an accounted-for blemish.
  *
  * All lookups are best-effort Options: a missing `git` binary or a
  * non-repo working dir yields None, and only the freeze gate treats
  * that as fatal (a mid-round bench on a detached copy still runs).
  */
object GitInfo {
  private def run(cmd: String*): Option[String] =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (p.waitFor() == 0) Some(out.trim) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Current HEAD SHA, if the working dir is a git repo. */
  def headSha(): Option[String] =
    run("git", "rev-parse", "HEAD").filter(_.matches("[0-9a-f]{7,40}"))

  /** Product sources (src/main) that differ from `since`: committed
    * changes in since..HEAD plus any uncommitted worktree changes.
    * None if git is unavailable or `since` is not a known commit. */
  def changedProductSources(since: String): Option[Seq[String]] =
    for {
      committed <- run("git", "diff", "--name-only", s"$since..HEAD", "--", "src/main")
      // --porcelain lines are "XY <path>"; strip the 3-char status.
      worktree <- run("git", "status", "--porcelain", "--", "src/main")
    } yield (committed.split('\n').map(_.trim) ++
      worktree.split('\n').map(_.drop(3).trim)).filter(_.nonEmpty).toSeq.distinct
}
