package graft

import graft.sources.{RegistryBackend, RegistryData}
import org.scalatest.funsuite.AnyFunSuite

/** The registry-client seam (VERDICT r8 #7): RegistrySource's Scaladoc
  * claims "a real registry service drops in by replacing RegistryData
  * with its client without touching any query". This spec EXERCISES that
  * claim: a second backend — a JSON-served fixture, the reference
  * registry's own wire shape — swaps in via RegistryData.withBackend, and
  * the DSv2 connector AND the whole r01–r14 query pack are shown to track
  * the new rows with zero query changes, then revert when the builtin
  * client is restored.
  */
class RegistrySeamSpec extends AnyFunSuite with SparkTestBase {

  /** A registry CLIENT over the reference's JSON document shape (the
    * HTTP body `GET /filetypes` / `GET /extractors` would return) — what
    * a real deployment implements against its service.
    */
  private class JsonRegistryClient(json: String) extends RegistryBackend {
    private val root = org.json4s.jackson.JsonMethods.parse(json)
      .values.asInstanceOf[Map[String, Any]]
    private def tbl(name: String): Seq[Map[String, Any]] =
      root(name).asInstanceOf[List[Any]].map(_.asInstanceOf[Map[String, Any]])
    override def rows(table: String): Seq[Seq[Any]] = table match {
      case "filetypes" => tbl("filetypes").map(m => Seq(
        m("id").asInstanceOf[String],
        m("registered_extractors").asInstanceOf[List[Any]].map(_.asInstanceOf[String])))
      case "usages" => tbl("usages").map(m => Seq(
        m("extractor_id").asInstanceOf[String],
        m("idx").toString.toInt,
        m("method").asInstanceOf[String],
        m("setup").asInstanceOf[String],
        m("command").asInstanceOf[String]))
      case "installations" => tbl("installations").map(m => Seq(
        m("extractor_id").asInstanceOf[String],
        m("method").asInstanceOf[String],
        m("package").asInstanceOf[String]))
    }
  }

  // a DIFFERENT registry: biologic-mpr's rank order flipped (galvani now
  // chosen), csv gains an extractor it never had, pdf is gone, and a
  // brand-new "newtool" extractor arrives with usages + installation
  private val fixtureJson = """
    {"filetypes": [
       {"id": "biologic-mpr", "registered_extractors": ["galvani", "yadg"]},
       {"id": "example-xy",   "registered_extractors": ["yadg"]},
       {"id": "nexus-hdf5",   "registered_extractors": ["h5grove"]},
       {"id": "csv",          "registered_extractors": ["newtool"]},
       {"id": "tiff",         "registered_extractors": []}],
     "usages": [
       {"extractor_id": "yadg", "idx": 0, "method": "python", "setup": "yadg",
        "command": "yadg.extractors.extract({{ input_type }}, {{ input_path }})"},
       {"extractor_id": "galvani", "idx": 0, "method": "python", "setup": "galvani",
        "command": "galvani.MPRfile({{ input_path }})"},
       {"extractor_id": "h5grove", "idx": 0, "method": "cli", "setup": "",
        "command": "h5dump {{ input_path }} > {{ output_path }}"},
       {"extractor_id": "newtool", "idx": 0, "method": "cli", "setup": "",
        "command": "newtool {{ input_path }} --out {{ output_path }}"},
       {"extractor_id": "newtool", "idx": 1, "method": "python", "setup": "newtool",
        "command": "newtool.load(path={{ input_path }}, fmt='auto')"}],
     "installations": [
       {"extractor_id": "yadg", "method": "pip", "package": "yadg~=5.0"},
       {"extractor_id": "galvani", "method": "pip", "package": "galvani>=0.4"},
       {"extractor_id": "h5grove", "method": "pip", "package": "h5grove"},
       {"extractor_id": "newtool", "method": "pip", "package": "newtool==1.2"}]}"""

  test("a JSON registry client swaps in: connector and all r-queries track it, zero query changes") {
    import spark.implicits._
    def chosen(): Map[String, String] =
      SparkEntry.queries("r02_extractor_select")(spark, sf)
        .select($"filetype_id", $"chosen_extractor").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap

    val before = chosen()
    assert(before("biologic-mpr") == "yadg" && !before.contains("csv"),
      "builtin baseline unexpected — seam test premises broken")

    RegistryData.withBackend(new JsonRegistryClient(fixtureJson)) {
      // the DSv2 connector serves the client's rows
      val viaConnector = spark.read.format("graft-registry")
        .option("table", "filetypes").load()
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(viaConnector("csv") == List("newtool") && viaConnector("tiff") == Nil
        && viaConnector("biologic-mpr") == List("galvani", "yadg")
        && !viaConnector.contains("pdf"),
        s"connector rows do not match the JSON client: $viaConnector")

      // the query pack re-derives from the same client — the rank flip
      // and the new csv registration surface with zero query changes
      val swapped = chosen()
      assert(swapped("biologic-mpr") == "galvani",
        "r02 did not track the client's flipped rank order")
      assert(swapped("csv") == "newtool",
        "r02 did not see the client's new csv registration")

      // every r-query runs unmodified over the swapped registry, and the
      // dispatch/install chain carries the new extractor end-to-end
      val rNames = SparkEntry.allQueries.map(_.name).filter(_.startsWith("r"))
      assert(rNames.size >= 14)
      val outputs = rNames.map { n =>
        n -> SparkEntry.queries(n)(spark, sf).collect()
      }.toMap
      outputs.foreach { case (n, rows) =>
        assert(rows != null, s"$n failed against the swapped registry") }
      def mentionsNewtool(name: String): Boolean =
        outputs(name).exists(_.toSeq.exists {
          case s: String => s.contains("newtool")
          case _ => false
        })
      for (q <- Seq("r05_file_dispatch", "r07_install_plan", "r14_call_plan_parse"))
        assert(mentionsNewtool(q), s"$q does not carry the client's new extractor")
    }

    // builtin client restored: the same query reverts byte-for-byte
    assert(chosen() == before, "restoring the builtin backend did not revert r02")
  }

  // ── HTTP variant (VERDICT r9 #7): the same swap served over a real ──
  // loopback HTTP server speaking the reference registry's wire shape
  // (GET /filetypes, GET /extractors → {"data": [...]}), through the
  // production HttpRegistryBackend with timeout/retry/404 handling.

  /** The seam fixture re-expressed in the reference's wire shape: the
    * filetypes list document and the extractors list document whose
    * per-entry fields are exactly what `__init__.py` reads per id.
    */
  private val filetypesDoc = """{"data": [
    {"id": "biologic-mpr", "registered_extractors": ["galvani", "yadg"]},
    {"id": "example-xy",   "registered_extractors": ["yadg"]},
    {"id": "nexus-hdf5",   "registered_extractors": ["h5grove"]},
    {"id": "csv",          "registered_extractors": ["newtool"]},
    {"id": "tiff",         "registered_extractors": []}]}"""
  private val extractorsDoc = """{"data": [
    {"id": "yadg",
     "usage": [{"method": "python", "setup": "yadg",
                "command": "yadg.extractors.extract({{ input_type }}, {{ input_path }})"}],
     "installation": [{"method": "pip", "packages": ["yadg~=5.0"]}]},
    {"id": "galvani",
     "usage": [{"method": "python", "setup": "galvani",
                "command": "galvani.MPRfile({{ input_path }})"}],
     "installation": [{"method": "pip", "packages": ["galvani>=0.4"]}]},
    {"id": "h5grove",
     "usage": [{"method": "cli", "setup": "",
                "command": "h5dump {{ input_path }} > {{ output_path }}"}],
     "installation": [{"method": "pip", "packages": ["h5grove"]}]},
    {"id": "newtool",
     "usage": [{"method": "cli", "setup": "",
                "command": "newtool {{ input_path }} --out {{ output_path }}"},
               {"method": "python", "setup": "newtool",
                "command": "newtool.load(path={{ input_path }}, fmt='auto')"}],
     "installation": [{"method": "pip", "packages": ["newtool==1.2"]}]}]}"""

  private def withServer[T](f: (String, java.util.concurrent.atomic.AtomicInteger) => T): T = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) x.getResponseBody.write(bytes)
      x.close()
    }
    server.createContext("/filetypes",
      (x: HttpExchange) => respond(x, 200, filetypesDoc))
    server.createContext("/extractors",
      (x: HttpExchange) => respond(x, 200, extractorsDoc))
    // transient-failure endpoint: 503 twice, then serves — the retry case
    server.createContext("/flaky", (x: HttpExchange) =>
      if (hits.incrementAndGet() <= 2) respond(x, 503, "busy")
      else respond(x, 200, """{"data": []}"""))
    // read-timeout endpoint: never answers inside a short client timeout
    server.createContext("/slow", (x: HttpExchange) => {
      Thread.sleep(2000); respond(x, 200, """{"data": []}""")
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("the HTTP registry client swaps in over a live server: connector and all r-queries green") {
    import spark.implicits._
    withServer { (base, _) =>
      val http = new graft.sources.HttpRegistryBackend(base)
      RegistryData.withBackend(http) {
        // the DSv2 connector serves rows fetched over HTTP
        val viaConnector = spark.read.format("graft-registry")
          .option("table", "filetypes").load()
          .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
        assert(viaConnector("csv") == List("newtool")
          && viaConnector("biologic-mpr") == List("galvani", "yadg")
          && viaConnector("tiff") == Nil,
          s"connector rows do not match the HTTP registry: $viaConnector")
        // the full query pack runs unmodified against the live service
        val rNames = SparkEntry.allQueries.map(_.name).filter(_.startsWith("r"))
        assert(rNames.size >= 14)
        rNames.foreach { n =>
          assert(SparkEntry.queries(n)(spark, sf).collect() != null,
            s"$n failed against the HTTP registry") }
        // the flip the JSON fixture encodes arrives over the wire too
        val chosen = SparkEntry.queries("r02_extractor_select")(spark, sf)
          .select($"filetype_id", $"chosen_extractor").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        assert(chosen("biologic-mpr") == "galvani" && chosen("csv") == "newtool")
        // usages idx = list position: newtool's two usages rank 0/1
        val u = RegistryData.rows("usages").filter(_.head == "newtool")
        assert(u.map(r => (r(1), r(2))) == Seq((0, "cli"), (1, "python")))
      }
    }
  }

  /** A registry implementing ONLY the reference's proven per-id surface
    * (`GET /filetypes/{id}`, `GET /extractors/{id}` →
    * `{"data": {object}}`, `__init__.py:96-123`): the bare list paths
    * 404, and the per-id bodies deliberately omit `id` — the client must
    * inject it from the URL.
    */
  private def withPerIdServer[T](f: String => T): T = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) x.getResponseBody.write(bytes)
      x.close()
    }
    val ftEntries = Map(
      "biologic-mpr" -> """{"registered_extractors": ["galvani", "yadg"]}""",
      "example-xy"   -> """{"registered_extractors": ["yadg"]}""",
      "nexus-hdf5"   -> """{"registered_extractors": ["h5grove"]}""",
      "csv"          -> """{"registered_extractors": ["newtool"]}""",
      "tiff"         -> """{"registered_extractors": []}""")
    val exEntries = Map(
      "yadg" -> """{
        "usage": [{"method": "python", "setup": "yadg",
                   "command": "yadg.extractors.extract({{ input_type }}, {{ input_path }})"}],
        "installation": [{"method": "pip", "packages": ["yadg~=5.0"]}]}""",
      "galvani" -> """{
        "usage": [{"method": "python", "setup": "galvani",
                   "command": "galvani.MPRfile({{ input_path }})"}],
        "installation": [{"method": "pip", "packages": ["galvani>=0.4"]}]}""",
      "h5grove" -> """{
        "usage": [{"method": "cli", "setup": "",
                   "command": "h5dump {{ input_path }} > {{ output_path }}"}],
        "installation": [{"method": "pip", "packages": ["h5grove"]}]}""",
      "newtool" -> """{
        "usage": [{"method": "cli", "setup": "",
                   "command": "newtool {{ input_path }} --out {{ output_path }}"},
                  {"method": "python", "setup": "newtool",
                   "command": "newtool.load(path={{ input_path }}, fmt='auto')"}],
        "installation": [{"method": "pip", "packages": ["newtool==1.2"]}]}""")
    def handler(prefix: String, entries: Map[String, String])
        : com.sun.net.httpserver.HttpHandler = (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      if (path == prefix || path == prefix + "/") respond(x, 404, "")
      else entries.get(path.stripPrefix(prefix + "/")) match {
        case Some(body) => respond(x, 200, s"""{"data": $body}""")
        case None => respond(x, 404, "")
      }
    }
    server.createContext("/filetypes", handler("/filetypes", ftEntries))
    server.createContext("/extractors", handler("/extractors", exEntries))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("per-id fallback: a registry serving ONLY the proven per-id surface still snapshots") {
    withPerIdServer { base =>
      val ftIds = Seq("biologic-mpr", "example-xy", "nexus-hdf5", "csv", "tiff")
      val exIds = Seq("yadg", "galvani", "h5grove", "newtool")
      val http = new graft.sources.HttpRegistryBackend(base,
        knownIds = Map("filetypes" -> ftIds, "extractors" -> exIds))
      // snapshot assembled from per-id GETs; ids injected from the URL
      val ft = http.rows("filetypes").map(r => r.head -> r(1)).toMap
      assert(ft("biologic-mpr") == List("galvani", "yadg") && ft("tiff") == Nil,
        s"per-id snapshot wrong: $ft")
      assert(ft.keySet == ftIds.toSet)
      val u = http.rows("usages").filter(_.head == "newtool")
      assert(u.map(r => (r(1), r(2))) == Seq((0, "cli"), (1, "python")),
        s"usage ranks wrong through the fallback: $u")
      val inst = http.rows("installations").filter(_.head == "yadg")
      assert(inst == Seq(Seq("yadg", "pip", "yadg~=5.0")), s"installs: $inst")
      // a missing known id stays loud (404 on the per-id GET itself)
      val bad = new graft.sources.HttpRegistryBackend(base,
        knownIds = Map("filetypes" -> (ftIds :+ "ghost"), "extractors" -> exIds))
      val eg = intercept[IllegalStateException](bad.rows("filetypes"))
      assert(eg.getMessage.contains("error:not_found"), eg.getMessage)
      // and without knownIds the list-endpoint 404 still fails fast
      val bare = new graft.sources.HttpRegistryBackend(base)
      val e = intercept[IllegalStateException](bare.rows("filetypes"))
      assert(e.getMessage.contains("error:not_found"), e.getMessage)
    }
  }

  test("HTTP failure modes map to r12's status vocabulary: 404, timeout, retry") {
    withServer { (base, hits) =>
      // 404 is a registry ANSWER — immediate, never retried
      val b404 = new graft.sources.HttpRegistryBackend(s"$base/nowhere")
      assert(b404.fetchStatus("filetypes") == "error:not_found")
      val e = intercept[IllegalStateException](b404.rows("filetypes"))
      assert(e.getMessage.contains("error:not_found"), e.getMessage)
      // read timeout after bounded retries
      val bSlow = new graft.sources.HttpRegistryBackend(base,
        readTimeoutMs = 100, retries = 1, retryBackoffMs = 10)
      assert(bSlow.fetchStatus("slow/filetypes") == "error:timeout")
      // connection refused (dead port) after retries
      val bDead = new graft.sources.HttpRegistryBackend("http://127.0.0.1:9",
        connectTimeoutMs = 100, retries = 0)
      assert(bDead.fetchStatus("filetypes") == "error:unreachable")
      // a 5xx hiccup is transient: two failures then success inside one call
      hits.set(0)
      val bFlaky = new graft.sources.HttpRegistryBackend(base,
        retries = 2, retryBackoffMs = 10)
      assert(bFlaky.fetchStatus("flaky/filetypes") == "ok")
      assert(hits.get() == 3, s"expected 2 failed + 1 ok attempt, saw ${hits.get()}")
      // but with too few retries the 503 surfaces in r12 vocabulary
      hits.set(0)
      val bGiveUp = new graft.sources.HttpRegistryBackend(base,
        retries = 1, retryBackoffMs = 10)
      assert(bGiveUp.fetchStatus("flaky/filetypes") == "error:http_503")
    }
  }
}
