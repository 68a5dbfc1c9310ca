package graft.operators

/** Shared reader for the `params.json` sidecar every persisted
  * dedup-index format writes (MinhashIndex, SrpIndex, DhashIndex) —
  * one parser, so a format tweak cannot be fixed in one loader and
  * silently break the others. */
private[operators] object IndexParams {
  def intOf(dir: String, key: String): Int = {
    val p = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "params.json"))
    s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(p)
      .getOrElse(sys.error(s"$dir/params.json lacks $key"))
      .group(1).toInt
  }
}
