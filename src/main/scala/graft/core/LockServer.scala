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
  *   ACQUIRE <key>          ->  OK <fence> | HELD
  *   RELEASE <key>          ->  OK | ERR           (ERR: caller not the owner)
  *   VERIFY <key> <fence>   ->  OK | STALE
  *   PING                   ->  PONG               (session keepalive)
  * }}}
  * A connection IS a session: every key it holds is released when it
  * closes (the ephemeral-node semantics — a writer that dies mid-commit
  * never wedges the table). Re-acquiring a key the same session already
  * holds answers OK with the SAME fence (idempotent, like an existing
  * ephemeral node you own). A RELEASE by a session that does not own the
  * key answers ERR and frees nothing — ZK errors loudly here too
  * (NONODE/NOAUTH analog); answering OK would let a buggy client believe
  * it released a lock it never held.
  *
  * '''Fencing''': every successful ACQUIRE mints a fence token from one
  * server-global monotonic counter (the ZK analog is the czxid / lock
  * node's sequence number). A holder passes its token to the commit
  * point, which calls VERIFY immediately before completing: once the
  * session drops and ANOTHER writer acquires, the key's current token is
  * strictly newer, so the stale writer's VERIFY answers STALE and its
  * commit aborts instead of racing the new holder. This closes the
  * session-loss window that neither the plain ephemeral contract nor the
  * reference's ZK provider closes (see [[TcpLockProvider]]'s doc).
  *
  * '''Session liveness''': when `idleTimeoutMs > 0` a session that sends
  * NOTHING for that long is presumed dead and reaped (socket closed, its
  * locks ephemeral-released) — a client that leaked its provider without
  * close() cannot pin a lock forever. Live holders stay alive the ZK way:
  * [[TcpLockProvider]] heartbeats PING at a third of the timeout.
  *
  * The server is deliberately tiny — lock traffic is one request/response
  * per COMMIT plus heartbeats, not per record, so a single accept loop
  * with per-session handler threads holds up at any realistic writer
  * count. */
class LockServer(bindPort: Int = 0, idleTimeoutMs: Int = 120000) {
  // key -> (owning session, fence token minted at acquire)
  private val owners = new ConcurrentHashMap[String, (Long, Long)]()
  private val sessions = ConcurrentHashMap.newKeySet[Socket]()
  private val nextSession = new AtomicLong(1L)
  private val nextFence = new AtomicLong(1L)
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

  /** Test observability: the current fence token for a key, if held. */
  private[graft] def fenceOf(key: String): Option[Long] =
    Option(owners.get(key)).map(_._2)

  /** Test seam: hard-drop every live session (socket closed server-side,
    * locks ephemeral-released) — the "partition hits mid-commit" fault a
    * fencing test injects. The server keeps accepting new sessions. */
  private[graft] def killSessions(): Unit = {
    sessions.forEach(s => try s.close() catch { case _: Exception => () })
    sessions.clear()
  }

  private def serve(sock: Socket): Unit = {
    val session = nextSession.getAndIncrement()
    sessions.add(sock)
    if (idleTimeoutMs > 0) sock.setSoTimeout(idleTimeoutMs)
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
    val out = new PrintWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8), true)
    try {
      var line = in.readLine()
      while (line != null) {
        // keys are table base paths and may contain spaces: ACQUIRE and
        // RELEASE take everything after the verb as the key; VERIFY's
        // fence is the final space-separated token
        line.split(" ", 2) match {
          case Array("ACQUIRE", key) =>
            // atomic acquire-if-free; the fence is minted ONLY when this
            // session becomes (or already is) the owner
            val owner = owners.merge(key, (session, nextFence.getAndIncrement()),
              (cur, _) => cur)
            out.println(if (owner._1 == session) s"OK ${owner._2}" else "HELD")
          case Array("RELEASE", key) =>
            // only the owner releases; a non-owner gets ERR, not a silent
            // OK a buggy client would read as "released"
            var released = false
            owners.computeIfPresent(key, (_, cur) =>
              if (cur._1 == session) { released = true; null } else cur)
            out.println(if (released) "OK" else "ERR")
          case Array("VERIFY", rest) if rest.lastIndexOf(' ') > 0 =>
            val cut = rest.lastIndexOf(' ')
            val (key, fence) = (rest.substring(0, cut), rest.substring(cut + 1))
            val cur = owners.get(key)
            val ok = cur != null && cur._1 == session && fence.nonEmpty &&
              fence.forall(_.isDigit) && cur._2 == fence.toLong
            out.println(if (ok) "OK" else "STALE")
          case Array("PING") => out.println("PONG")
          case _ => out.println("ERR")
        }
        line = in.readLine()
      }
    } catch {
      case _: java.net.SocketTimeoutException => () // idle reap: fall through
      case _: java.io.IOException => ()
    }
    finally {
      // session teardown = ephemeral release of everything it held
      owners.entrySet().removeIf(e => e.getValue._1 == session)
      sessions.remove(sock)
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
  * The provider's keepalive thread holds the session through any
  * server-side idle timeout. Usage: `LockProbe <host> <port> <key>`. */
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
  * `lockProvider = "tcp:<host>:<port>"`). A daemon keepalive thread
  * PINGs at `keepaliveMs` while connected, so a held lock survives the
  * server's idle-session reaping (the ZK client's heartbeat).
  *
  * Session-loss window, and how fencing closes it: if the SESSION drops
  * while the lock is held (connection reset mid-critical-section), the
  * server frees the key and a second writer may enter before the first
  * writer's next call notices the loss — the ZK session-expiry race,
  * which the reference's ZK provider leaves open. Here every ACQUIRE
  * returns a monotonic '''fence token'''; the commit point calls
  * [[verifyFence]] immediately before completing, and a stale holder
  * (session lost, key re-acquired with a newer token — or lost and NOT
  * re-acquired: the lost session cannot answer OK for a key it no longer
  * owns) reads STALE and aborts. The residual exposure is the instants
  * between a passed VERIFY and the completing write — narrowed from the
  * whole critical section to one metadata write that is itself
  * create-exclusive on storage. */
class TcpLockProvider(host: String, port: Int, key: String,
    keepaliveMs: Int = 30000) extends LockProvider {
  private var sock: Socket = null
  private var in: BufferedReader = null
  private var out: PrintWriter = null
  private var fence: Option[Long] = None
  @volatile private var pinger: Thread = null

  private def ensureConnected(): Unit =
    if (sock == null || sock.isClosed) {
      try {
        sock = new Socket(host, port)
        in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        out = new PrintWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8), true)
        startPinger()
      } catch {
        case e: java.io.IOException =>
          sock = null
          throw new IllegalStateException(
            s"lock server unreachable at $host:$port " +
              "(mutual exclusion cannot be guaranteed; refusing to proceed)", e)
      }
    }

  /** Keepalive against the server's idle-session reaping. One daemon
    * thread per provider (providers are per-commit and close()d after);
    * a failed PING just stops the thread — the next real call fails
    * loudly through the normal path. */
  private def startPinger(): Unit = {
    if (pinger != null || keepaliveMs <= 0) return
    val t = new Thread(() => {
      try {
        while (sock != null && !sock.isClosed) {
          Thread.sleep(keepaliveMs.toLong)
          call("PING")
        }
      } catch { case _: Throwable => () }
    }, "graft-lock-keepalive")
    t.setDaemon(true)
    t.start()
    pinger = t
  }

  private def stopPinger(): Unit = {
    // providers are per-commit: without the interrupt every commit would
    // park a dying keepalive thread for up to a full sleep interval
    if (pinger != null) { pinger.interrupt(); pinger = null }
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

  override def tryLock(): Boolean = call(s"ACQUIRE $key") match {
    case ok if ok.startsWith("OK") =>
      fence = ok.split(" ", 2).lift(1).filter(_.forall(_.isDigit)).map(_.toLong)
      true
    case _ => false
  }

  /** Best-effort: neither an ERR (not the owner — e.g. the session was
    * lost and reconnected) nor a dead session throws, because unlock
    * runs in the commit path's finally and a throw there would mask the
    * body's outcome — including the fence-abort this very session loss
    * caused. The server's session teardown releases the key anyway. */
  override def unlock(): Unit = {
    try call(s"RELEASE $key") catch { case _: IllegalStateException => () }
    fence = None
  }

  override def fenceToken: Option[Long] = fence

  /** True iff this session still owns `key` under the SAME fence minted
    * at acquire. A lost session answers STALE (the reconnected socket is
    * a NEW session that owns nothing), as does a key re-acquired by a
    * newer holder. */
  override def verifyFence(): Boolean = fence match {
    case Some(f) =>
      (try call(s"VERIFY $key $f") catch { case _: IllegalStateException => "STALE" }) == "OK"
    case None => false
  }

  /** End the session: closes the socket (the server then ephemeral-
    * releases anything the session still held). One provider is minted
    * per commit, so without this every commit would leak a client fd
    * AND a server session thread. Idempotent. */
  override def close(): Unit = synchronized {
    if (sock != null) {
      try sock.close() catch { case _: Exception => () }
      sock = null
    }
    stopPinger()
  }

  override def describe: String = s"tcp://$host:$port/$key"
}
