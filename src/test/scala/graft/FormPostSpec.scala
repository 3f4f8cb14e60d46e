package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import sources.FormPost

/** Form-POST (ASP.NET-postback) source against a canned-fixture JDK
  * HttpServer that enforces the REAL protocol: every response issues
  * fresh ONE-TIME state tokens, every POST must echo the latest pair
  * or is rejected with HTTP 500, and paging advances only through the
  * hidden __NEXT token. Rows coming back at all proves the token
  * threading is real — there is no replay or skip path. */
class FormPostSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // token → page index it unlocks; tokens are one-time (removed on use)
  private val liveState = ConcurrentHashMap.newKeySet[String]()
  private val liveNext = new ConcurrentHashMap[String, Int]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var rejected = 0

  private def freshState(): (String, String) = {
    val vs = s"vs-${ctr.incrementAndGet()}"; val ev = s"ev-${ctr.incrementAndGet()}"
    liveState.add(vs); liveState.add(ev); (vs, ev)
  }

  private def page(district: String, p: Int, lastPage: Int): String = {
    val (vs, ev) = freshState()
    val next = if (p < lastPage) {
      val t = s"nx-${ctr.incrementAndGet()}"; liveNext.put(t, p + 1)
      s"""<input type="hidden" name="__NEXT" value="$t"/>"""
    } else ""
    val rows = (0 until 3).map(i =>
      s"<tr><td>$district-school-$p-$i</td><td>${100 + 10 * p + i}</td></tr>")
      .mkString
    // district B page 1 carries one arity-broken row → quarantine path
    val bad = if (district == "B" && p == 1) "<tr><td>orphan-cell</td></tr>" else ""
    s"""<html><body><form>
       |<input type="hidden" name="__VIEWSTATE" value="$vs"/>
       |<input type="hidden" name="__EVENTVALIDATION" value="$ev"/>
       |$next
       |<table><tr><th>School</th><th>Grads</th></tr>$rows$bad</table>
       |</form></body></html>""".stripMargin
  }

  private def formPage(): String = {
    val (vs, ev) = freshState()
    s"""<html><body><form>
       |<input type="hidden" name="__VIEWSTATE" value="$vs"/>
       |<input type="hidden" name="__EVENTVALIDATION" value="$ev"/>
       |<select name="district"><option>A</option><option>B</option></select>
       |</form></body></html>""".stripMargin
  }

  private def startServer(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/scores", (x: HttpExchange) => {
      def respond(status: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(status, b.length)
        x.getResponseBody.write(b); x.close()
      }
      try {
        if (x.getRequestMethod == "GET") respond(200, formPage())
        else {
          val form = new String(x.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
            .split("&").filter(_.nonEmpty).map { kv =>
              val Array(k, v) = kv.split("=", 2)
              java.net.URLDecoder.decode(k, "UTF-8") ->
                java.net.URLDecoder.decode(v, "UTF-8")
            }.toMap
          val okState = form.get("__VIEWSTATE").exists(liveState.remove) &
            form.get("__EVENTVALIDATION").exists(liveState.remove)
          val p = form.get("__NEXT") match {
            case None => Some(0)
            case Some(t) => Option(liveNext.remove(t)).map(_.intValue)
          }
          (form.get("district"), p) match {
            case (Some(d), Some(pg)) if okState =>
              respond(200, page(d, pg, lastPage = 1))
            case _ =>
              rejected += 1; respond(500, "postback state rejected")
          }
        }
      } catch { case e: Exception => respond(500, e.toString) }
    })
    server.start()
    server
  }

  private val schema = new StructType()
    .add("school", StringType).add("grads", StringType)

  test("distributed postback chains: all districts, all pages, header-mapped") {
    val server = startServer()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/scores"
      val df = FormPost.read(spark, url,
        combos = Seq(Seq("district" -> "A"), Seq("district" -> "B")),
        schema = schema, nextField = Some("__NEXT"), retries = 0).cache()
      val good = df.filter(col(sources.HtmlTables.RescueCol).isNull)
      val got = good.select("school", "grads").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = (for (d <- Seq("A", "B"); p <- 0 to 1; i <- 0 until 3)
        yield (s"$d-school-$p-$i", (100 + 10 * p + i).toString)).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      // provenance carries combo and page
      val files = good.select("file").distinct().collect()
        .map(_.getString(0)).toSet
      assert(files == Set("combo=district=A#page=0", "combo=district=A#page=1",
        "combo=district=B#page=0", "combo=district=B#page=1"))
      // the arity-broken row quarantined, not dropped or crashed
      val bad = df.filter(col(sources.HtmlTables.RescueCol).isNotNull).collect()
      assert(bad.length == 1 && bad(0).getAs[String](sources.HtmlTables.RescueCol)
        .contains("orphan-cell"))
      assert(rejected == 0, s"fixture rejected $rejected valid postbacks")
      df.unpersist()
    } finally server.stop(0)
  }

  test("a POST without live tokens is rejected — the chain cannot be skipped") {
    val server = startServer()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/scores"
      val e = intercept[RuntimeException] {
        FormPost.exchange(url,
          Some(Seq("district" -> "A", "__VIEWSTATE" -> "forged",
            "__EVENTVALIDATION" -> "forged")), retries = 0)
      }
      assert(e.getMessage.contains("500") ||
        Option(e.getCause).exists(_.getMessage.contains("500")))
    } finally server.stop(0)
  }

  test("hiddenFields parses attribute-order and quoting variants") {
    val html = """<input name="a" type="hidden" value="1"/>
      |<INPUT type='hidden' name='b' value='2'>
      |<input type="hidden" value="3" name="c"/>
      |<input type="text" name="visible" value="x"/>""".stripMargin
    val got = FormPost.hiddenFields(html)
    assert(got.get("a").contains("1") && got.get("b").contains("2"))
    assert(!got.contains("visible"))
  }
}
