package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE crash roll-forward for two-rename directory swaps — extracted
  * (VERDICT r16 #5) so a module doing the swap cannot ship without
  * recovery wired in. Three stores ride the same discipline with
  * different parked-path suffixes:
  *
  *   - [[BucketedStore.replace]] (`.bkt-old`)
  *   - [[ModelStore.write]]'s retrain path (`.model-old`)
  *   - [[Compactor.compact]] (`.compact-old`)
  *
  * The swap is rename(root → parked) then rename(staged → root): at
  * every instant the data exists complete in exactly one directory,
  * but a crash BETWEEN the renames leaves `root` missing and the only
  * complete copy parked at the dot-prefixed sibling — which partition
  * discovery and directory listings deliberately ignore, so without a
  * roll-forward a fresh consumer either fails at boot (catalog
  * stores) or, worse, SILENTLY serves without the parked rows
  * (partitioned path stores — VERDICT r16 top item). [[recover]] is
  * that roll-forward: root missing ∧ parked present → promote the
  * parked copy back. Idempotent; the healthy fast path costs one
  * `fs.exists`. Each store calls it from its maintenance writer AND
  * its read/boot path (recovery only a writer runs leaves fresh
  * serving sessions broken until the next maintenance fold — the
  * round-15/16 gap class).
  */
private[graft] object SwapStore {

  /** The dot-prefixed sibling a swap parks the pre-swap copy at:
    * `parent/.{name}{suffix}`. Dot-prefixed so partition discovery
    * over an enclosing store ignores it. */
  def parkedOf(root: Path, suffix: String): Path =
    new Path(root.getParent, "." + root.getName + suffix)

  /** Roll a crashed mid-swap state forward: if `root` is missing and
    * the parked copy exists, promote it back. Returns true iff a
    * promotion happened (callers refresh catalogs / clear stale
    * stages only then). */
  def recover(fs: FileSystem, root: Path, suffix: String): Boolean = {
    val parked = parkedOf(root, suffix)
    if (!fs.exists(root) && fs.exists(parked)) {
      if (!fs.rename(parked, root)) {
        // exists→rename is not atomic: a concurrent writer (another
        // recovering reader, or a maintenance job re-publishing) may
        // have recreated root between the check and the rename, and
        // the filesystem then rightly refuses the promotion. Root now
        // present = the store is healthy and someone else recovered
        // or republished it — not a failure. Only a root STILL
        // missing is loud-failed: silently proceeding would surface
        // later as a missing-table error with no hint that the data
        // sits intact at the parked path.
        if (fs.exists(root)) return false
        throw new java.io.IOException(
          s"swap recover failed: cannot promote $parked back to $root")
      }
      true
    } else false
  }
}
