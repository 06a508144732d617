package graft.extract

import java.nio.charset.StandardCharsets

/** Shared machinery for the HTTP clients ([[HttpLlmClient]],
  * [[HttpEncoderClient]]): bounded retry with deterministic
  * exponential backoff, round-robin key rotation, and the
  * Hadoop-FileSystem string cache (temp-then-rename writes; file:,
  * hdfs:, s3a: all work). One implementation so a fix to backoff,
  * throttle handling, or cache atomicity lands in every client.
  */
private[extract] object HttpSupport {

  /** Run `f` up to `maxRetries` times, sleeping backoffMs·2^(n−1)
    * before retry n; retries on [[HttpLlmClient.RetryableHttpError]]
    * (429/5xx) and IOException, rethrows everything else immediately.
    */
  def withRetries[T](maxRetries: Int, backoffMs: Long, what: String)(f: => T): T = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < math.max(1, maxRetries)) {
      if (attempt > 0) Thread.sleep(backoffMs << (attempt - 1)) // 1x, 2x, 4x…
      try return f
      catch {
        case e: HttpLlmClient.RetryableHttpError => lastErr = e
        case e: java.io.IOException              => lastErr = e
      }
      attempt += 1
    }
    throw new java.io.IOException(s"$what failed after $maxRetries attempts", lastErr)
  }

  /** Round-robin key rotation; AtomicInteger makes concurrent
    * per-attribute driver threads and executor tasks each take the
    * next key without duplication inside one JVM.
    */
  final class KeyRotor(keys: Seq[String]) extends Serializable {
    @transient private lazy val rotor = new java.util.concurrent.atomic.AtomicInteger(0)
    def next(): String = keys((rotor.getAndIncrement() % keys.size + keys.size) % keys.size)
  }

  @transient private lazy val hadoopConf = new org.apache.hadoop.conf.Configuration()

  private def fs(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(hadoopConf)

  /** Entries are SELF-VERIFYING (r13 VERDICT #8): line 1 is the
    * sha-256 of the payload, the rest is the payload. A corrupt file
    * — truncated by a crashed writer, bit-rotted, or hand-damaged —
    * fails the digest check and reads as a MISS: the entry is deleted
    * and the caller refetches. Degrade, never serve damaged bytes;
    * an un-checksummed store fed a corrupt vector entry straight into
    * Float parsing (a NumberFormatException killing the whole
    * embedding pass). Legacy header-less entries fail the check the
    * same way and simply refetch once.
    */
  def cacheGet(dir: String, key: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, key)
    val f = fs(dir)
    if (!f.exists(p)) None
    else {
      // the read itself can throw on damage (e.g. LocalFileSystem's
      // own .crc sidecar raises ChecksumException on a bit-rotted
      // file) — any IO failure here is the same fault as a digest
      // mismatch and must degrade to a miss, not kill the pass
      val raw =
        try {
          val in = f.open(p)
          try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.IOException => None }
      val ok = raw.exists(r =>
        r.indexOf('\n') == 64 && r.substring(0, 64) == HttpLlmClient.sha256(r.substring(65)))
      if (ok) raw.map(_.substring(65))
      else { // corrupt, unreadable, or legacy: drop and report a miss
        try f.delete(p, false) catch { case _: java.io.IOException => () }
        None
      }
    }
  }

  /** Rename-into-place: concurrent writers of the same key race
    * benignly (deterministic clients produce identical content).
    */
  def cachePut(dir: String, key: String, value: String): Unit = {
    val f   = fs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$key.${Thread.currentThread().getId}.tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, key)
    val out = f.create(tmp, true)
    try out.write((HttpLlmClient.sha256(value) + "\n" + value).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, dst)) f.delete(tmp, false)
  }
}
