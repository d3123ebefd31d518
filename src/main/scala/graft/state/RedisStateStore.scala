package graft.state

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Redis-backed [[StateStore]] ≙ the reference's `RedisStateManager`
  * (state/managers.py:118-221): namespaced keys (`namespace:key`),
  * whole-value GET / SET / DEL. Speaks RESP — the public REdis
  * Serialization Protocol — directly over a socket: the three commands
  * the state contract needs are a dozen lines of framing, and no Redis
  * client library ships with the engine. Length-prefixed bulk strings
  * make values binary-safe (newlines, UTF-8, the works).
  *
  * Driver-side only, like every [[StateStore]]: the watermark is a
  * handful of round trips per pipeline run — this never executes on
  * executors or inside a stage. One connection, lazily opened,
  * reconnected once per command on IO failure (a half-dead keepalive
  * socket is the common failure mode between widely-spaced runs).
  */
final class RedisStateStore(host: String, port: Int,
                            namespace: String = "graft_default",
                            connectTimeoutMs: Int = 5000,
                            readTimeoutMs: Int = 10000)
    extends StateStore with AutoCloseable {

  private var socket: Socket = _
  private var in: BufferedInputStream = _
  private var out: BufferedOutputStream = _

  private def rkey(key: String): String = s"$namespace:$key"

  override def get(key: String): Option[String] =
    command("GET", rkey(key)).asInstanceOf[Option[String]]

  override def set(key: String, value: String): Unit =
    command("SET", rkey(key), value)

  override def delete(key: String): Unit =
    command("DEL", rkey(key))

  /** Raw command passthrough ≙ RedisStateManager.execute
    * (state/managers.py:211-218) — NO namespacing applied. Returns the
    * parsed RESP reply: simple string, Long, or Option[String] bulk.
    */
  def execute(cmd: String, args: String*): Any =
    command(cmd +: args: _*)

  override def close(): Unit = synchronized {
    if (socket != null) {
      try socket.close() catch { case _: IOException => () }
      socket = null
    }
  }

  private def connect(): Unit = {
    close()
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    s.setSoTimeout(readTimeoutMs)
    socket = s
    in = new BufferedInputStream(s.getInputStream)
    out = new BufferedOutputStream(s.getOutputStream)
  }

  /** One RESP command round trip; reconnects and retries once on IO
    * failure so a stale pooled connection doesn't fail the run.
    */
  private def command(args: String*): Any = synchronized {
    if (socket == null) connect()
    try roundTrip(args)
    catch {
      case _: IOException =>
        connect()
        roundTrip(args)
    }
  }

  private def roundTrip(args: Seq[String]): Any = {
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    for (a <- args) {
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b)
      out.write("\r\n".getBytes(UTF_8))
    }
    out.flush()
    readReply()
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new IOException("connection closed mid-reply")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new IOException("malformed RESP line terminator")
    sb.toString
  }

  private def readExactly(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new IOException("connection closed mid-bulk")
      off += r
    }
    buf
  }

  private def readReply(): Any = {
    val t = in.read()
    if (t < 0) throw new IOException("connection closed before reply")
    t.toChar match {
      case '+' => readLine() // simple string, e.g. OK
      case ':' => readLine().toLong // integer, e.g. DEL count
      case '-' =>
        val err = readLine()
        throw new IllegalStateException(s"redis error reply: $err")
      case '$' =>
        val len = readLine().toInt
        if (len < 0) None // null bulk = missing key
        else {
          val body = readExactly(len)
          if (in.read() != '\r' || in.read() != '\n')
            throw new IOException("malformed RESP bulk terminator")
          Some(new String(body, UTF_8))
        }
      case other =>
        throw new IOException(s"unsupported RESP reply type '$other'")
    }
  }
}
