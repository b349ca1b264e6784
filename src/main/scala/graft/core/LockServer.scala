package graft.core

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Minimal out-of-process lock service: the ZooKeeper-class stand-in
  * behind the [[LockProvider]] seam (reference analog:
  * transaction/lock/ZookeeperBasedLockProvider.java:55, whose mutual
  * exclusion lives in an EXTERNAL service and whose liveness contract is
  * the ephemeral node — a crashed client's lock evaporates with its
  * session).
  *
  * One lock table keyed by string; line protocol over TCP:
  * {{{
  *   ACQUIRE <key>   ->  OK | HELD
  *   RELEASE <key>   ->  OK
  * }}}
  * A connection IS a session: every key it holds is released when it
  * closes (the ephemeral-node semantics — a writer that dies mid-commit
  * never wedges the table). Re-acquiring a key the same session already
  * holds answers OK (idempotent, like an existing ephemeral node you
  * own). The server is deliberately tiny — lock traffic is one
  * request/response per COMMIT, not per record, so a single accept loop
  * with per-session handler threads holds up at any realistic writer
  * count. */
class LockServer(bindPort: Int = 0) {
  private val owners = new ConcurrentHashMap[String, Long]()
  private val nextSession = new AtomicLong(1L)
  @volatile private var server: ServerSocket = null
  @volatile private var running = false

  /** Bind + start the accept loop; returns the bound port. */
  def start(): Int = synchronized {
    require(server == null, "lock server already started")
    server = new ServerSocket(bindPort)
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "graft-lockserver-session")
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => () } // closed on stop
      }
    }, "graft-lockserver-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def port: Int = server.getLocalPort

  def stop(): Unit = synchronized {
    running = false
    if (server != null) { try server.close() catch { case _: Exception => () } }
    owners.clear()
  }

  /** Test observability: keys currently held. */
  private[graft] def heldKeys: Set[String] = {
    import scala.jdk.CollectionConverters._
    owners.keySet().asScala.toSet
  }

  private def serve(sock: Socket): Unit = {
    val session = nextSession.getAndIncrement()
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
    val out = new PrintWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8), true)
    try {
      var line = in.readLine()
      while (line != null) {
        line.split(" ", 2) match {
          case Array("ACQUIRE", key) =>
            val owner = owners.merge(key, session,
              (cur, _) => cur) // atomic acquire-if-free
            out.println(if (owner == session) "OK" else "HELD")
          case Array("RELEASE", key) =>
            owners.remove(key, session) // only the owner releases
            out.println("OK")
          case _ => out.println("ERR")
        }
        line = in.readLine()
      }
    } catch { case _: java.io.IOException => () }
    finally {
      // session teardown = ephemeral release of everything it held
      owners.entrySet().removeIf(e => e.getValue == session)
      try sock.close() catch { case _: Exception => () }
    }
  }
}

/** Minimal foreign-writer stand-in for cross-JVM lock tests: acquires
  * `key` against a running [[LockServer]], reports the verdict on
  * stdout (`ACQUIRED` / `HELD`), then holds the session open until the
  * process dies — so a test can assert real inter-PROCESS exclusion and
  * the crash-release (ephemeral) contract by killing it. Pure JVM, no
  * Spark: launchable with just the compiled classes on the classpath.
  * Usage: `LockProbe <host> <port> <key>`. */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val Array(host, port, key) = args
    val p = new TcpLockProvider(host, port.toInt, key)
    // println flushes; the parent reads this line before acting
    println(if (p.tryLock()) "ACQUIRED" else "HELD")
    while (true) Thread.sleep(1000) // hold until killed
  }
}

/** Client side of [[LockServer]]: one socket = one session, so a crashed
  * writer's locks evaporate server-side exactly like a lost ZooKeeper
  * session's ephemeral nodes. An unreachable server FAILS LOUDLY — a
  * silent false from tryLock would read as "held by a peer" and break
  * the mutual-exclusion guarantee the table was configured for
  * (reference analog: ZookeeperBasedLockProvider.java:55; selected via
  * `lockProvider = "tcp:<host>:<port>"`).
  *
  * Known window, shared with every ephemeral-session lock including the
  * reference's ZK provider: if the SESSION drops while the lock is held
  * (connection reset mid-critical-section), the server frees the key and
  * a second writer may enter before the first writer's next call notices
  * the loss — exactly the ZK session-expiry race. Publication layers a
  * second defense — the overlapping-file-group conflict check re-reads
  * the timeline under the (believed-held) lock before the
  * create-exclusive instant write — which narrows the exposure to both
  * writers passing their checks inside the same loss interval, but does
  * not close it: check-then-complete is itself lock-dependent. Closing
  * it fully needs fencing (a token minted with the lock and verified at
  * the commit point), which neither this provider nor the reference's
  * ZK provider implements. */
class TcpLockProvider(host: String, port: Int, key: String)
    extends LockProvider {
  private var sock: Socket = null
  private var in: BufferedReader = null
  private var out: PrintWriter = null

  private def ensureConnected(): Unit =
    if (sock == null || sock.isClosed) {
      try {
        sock = new Socket(host, port)
        in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        out = new PrintWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8), true)
      } catch {
        case e: java.io.IOException =>
          sock = null
          throw new IllegalStateException(
            s"lock server unreachable at $host:$port " +
              "(mutual exclusion cannot be guaranteed; refusing to proceed)", e)
      }
    }

  private def call(cmd: String): String = synchronized {
    ensureConnected()
    try {
      out.println(cmd)
      val r = in.readLine()
      if (r == null) throw new java.io.IOException("lock server closed the session")
      r
    } catch {
      case e: java.io.IOException =>
        try sock.close() catch { case _: Exception => () }
        sock = null
        throw new IllegalStateException(
          s"lost lock server session at $host:$port mid-call", e)
    }
  }

  override def tryLock(): Boolean = call(s"ACQUIRE $key") == "OK"
  override def unlock(): Unit = { call(s"RELEASE $key"); () }

  /** End the session: closes the socket (the server then ephemeral-
    * releases anything the session still held). One provider is minted
    * per commit, so without this every commit would leak a client fd
    * AND a server session thread. Idempotent. */
  override def close(): Unit = synchronized {
    if (sock != null) {
      try sock.close() catch { case _: Exception => () }
      sock = null
    }
  }

  override def describe: String = s"tcp://$host:$port/$key"
}
