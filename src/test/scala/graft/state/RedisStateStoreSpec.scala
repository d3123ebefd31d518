package graft.state

import java.io.{BufferedInputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import org.scalatest.funsuite.AnyFunSuite

/** In-process stub speaking just enough RESP to exercise the client:
  * parses command arrays, serves GET/SET/DEL over a shared map, errors
  * on anything else. Accepts any number of sequential connections (the
  * client reconnects after a dropped socket) and can sever live
  * connections on demand to simulate a stale keepalive.
  */
private final class StubRedis {
  val data = new ConcurrentHashMap[String, String]()
  private val server = new ServerSocket(0)
  private val live = java.util.Collections.synchronizedList(new java.util.ArrayList[Socket]())
  def port: Int = server.getLocalPort

  def killConnections(): Unit = {
    live.forEach(s => try s.close() catch { case _: IOException => () })
    live.clear()
  }

  private val acceptor = new Thread(() => {
    try while (true) { val s = server.accept(); live.add(s); serve(s) }
    catch { case _: IOException => () } // server closed
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    val t = new Thread(() => {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      def line(): String = {
        val sb = new java.lang.StringBuilder
        var c = in.read()
        if (c < 0) throw new IOException("eof")
        while (c != '\r') { sb.append(c.toChar); c = in.read() }
        in.read() // \n
        sb.toString
      }
      try while (true) {
        val first = line()
        assert(first.startsWith("*"), s"expected array, got $first")
        val n = first.drop(1).toInt
        val args = (0 until n).map { _ =>
          val len = line().drop(1).toInt
          val buf = new Array[Byte](len)
          var off = 0
          while (off < len) off += in.read(buf, off, len - off)
          in.read(); in.read() // \r\n
          new String(buf, UTF_8)
        }
        args.head.toUpperCase match {
          case "SET" => data.put(args(1), args(2)); out.write("+OK\r\n".getBytes(UTF_8))
          case "GET" =>
            Option(data.get(args(1))) match {
              case Some(v) =>
                val b = v.getBytes(UTF_8)
                out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b); out.write("\r\n".getBytes(UTF_8))
              case None => out.write("$-1\r\n".getBytes(UTF_8))
            }
          case "DEL" =>
            val removed = if (data.remove(args(1)) != null) 1 else 0
            out.write(s":$removed\r\n".getBytes(UTF_8))
          case other => out.write(s"-ERR unknown command '$other'\r\n".getBytes(UTF_8))
        }
        out.flush()
      } catch { case _: IOException => () }
      finally sock.close()
    })
    t.setDaemon(true)
    t.start()
  }

  def close(): Unit = { killConnections(); server.close() }
}

class RedisStateStoreSpec extends AnyFunSuite {

  private def withStore[T](f: (StubRedis, RedisStateStore) => T): T = {
    val stub = new StubRedis
    val store = new RedisStateStore("127.0.0.1", stub.port, namespace = "graft_test")
    try f(stub, store)
    finally { store.close(); stub.close() }
  }

  test("set/get/delete round trip, namespaced keys, binary-safe values") {
    withStore { (stub, store) =>
      assert(store.get("last_update_at").isEmpty)
      store.set("last_update_at", "2024-01-09T18:00:00.000+0300")
      // RESP bulk strings are length-prefixed: newlines/quotes/UTF-8 pass through
      store.set("weird", "a\"b\\c\nd\te и 😎")
      assert(store.get("last_update_at").contains("2024-01-09T18:00:00.000+0300"))
      assert(store.get("weird").contains("a\"b\\c\nd\te и 😎"))
      // the reference's namespace:key layout (state/managers.py:168-170)
      assert(stub.data.containsKey("graft_test:last_update_at"))
      store.delete("weird")
      assert(store.get("weird").isEmpty)
      assert(!stub.data.containsKey("graft_test:weird"))
    }
  }

  test("reconnects once after a dropped connection instead of failing the run") {
    withStore { (stub, store) =>
      store.set("k", "v1")
      stub.killConnections() // the stale-keepalive case between runs
      assert(store.get("k").contains("v1")) // transparently reconnected
      stub.killConnections()
      store.set("k", "v2") // writes reconnect too
      assert(store.get("k").contains("v2"))
    }
  }

  test("StateStore.fromUri dispatches redis:// to Redis, everything else to file") {
    val r = StateStore.fromUri("redis://10.0.0.5:6380/myns")
    assert(r.isInstanceOf[RedisStateStore])
    assert(StateStore.fromUri("redis://host").isInstanceOf[RedisStateStore])
    assert(StateStore.fromUri("redis://host/ns").isInstanceOf[RedisStateStore])
    assert(StateStore.fromUri("file:///tmp/state.json").isInstanceOf[FileStateStore])
    assert(StateStore.fromUri("s3a://bucket/state.json").isInstanceOf[FileStateStore])
    assert(StateStore.fromUri("/tmp/state.json").isInstanceOf[FileStateStore])
  }

  test("execute passthrough returns parsed replies; error replies raise") {
    withStore { (_, store) =>
      store.set("k", "v")
      assert(store.execute("GET", "graft_test:k") == Some("v"))
      assert(store.execute("DEL", "graft_test:k") == 1L)
      val e = intercept[IllegalStateException](store.execute("FLUSHALL"))
      assert(e.getMessage.contains("ERR unknown command"))
    }
  }
}
