package graft.etl

import java.io.IOException
import java.net.HttpURLConnection
import java.nio.file.{Files, Paths, StandardCopyOption}

/** A1's network half: fetch a dump over HTTP(S) before the pipeline
  * reads it (`/root/reference/dbfy.py:84-97` downloads the URL to a
  * local file and proceeds on that path — same contract here).
  *
  * Streamed copy, never memory-buffered: real dumps are tens of GB. The
  * declared Content-Length is enforced after the copy so a truncated
  * transfer fails loudly instead of parsing a partial dump. Exercised
  * against a loopback HTTP server in DownloadSpec (this image has no
  * egress; the code path is the same for any reachable mirror).
  */
object Download {

  def isHttp(src: String): Boolean =
    src.startsWith("http://") || src.startsWith("https://")

  /** GET `url` into `destDir/<last path segment>`, return the local
    * path. Follows up to 5 redirects MANUALLY — HttpURLConnection's
    * auto-follow never crosses protocols, and the common real-world
    * case is exactly an http→https 301 from a dump mirror. */
  def fetch(url: String,
            destDir: String = System.getProperty("java.io.tmpdir")): String = {
    var current = url
    var redirects = 0
    while (true) {
      val u = java.net.URI.create(current).toURL
      val name = new java.io.File(u.getPath).getName
      require(name.nonEmpty, s"URL has no file name: $current")
      val dest = Paths.get(destDir, name)
      val conn = u.openConnection().asInstanceOf[HttpURLConnection]
      conn.setInstanceFollowRedirects(false)
      conn.setConnectTimeout(30 * 1000)
      conn.setReadTimeout(10 * 60 * 1000)
      val code = conn.getResponseCode
      if (code / 100 == 3 && conn.getHeaderField("Location") != null) {
        val loc = conn.getHeaderField("Location")
        conn.disconnect()
        redirects += 1
        if (redirects > 5)
          throw new IOException(s"GET $url: too many redirects (last: $loc)")
        current = java.net.URI.create(current).resolve(loc).toString
      } else if (code / 100 != 2) {
        conn.disconnect()
        throw new IOException(s"GET $current failed: HTTP $code")
      } else {
        val expected = conn.getContentLengthLong
        val in = conn.getInputStream
        try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
        finally {
          in.close()
          conn.disconnect()
        }
        val got = Files.size(dest)
        if (expected >= 0 && got != expected) {
          Files.deleteIfExists(dest) // never leave a partial dump behind
          throw new IOException(
            s"truncated download of $current: got $got bytes, expected $expected")
        }
        return dest.toString
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
