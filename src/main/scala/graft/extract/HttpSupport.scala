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

  def cacheGet(dir: String, key: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, key)
    val f = fs(dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
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
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, dst)) f.delete(tmp, false)
  }
}
