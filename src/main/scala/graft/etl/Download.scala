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

  /** GET `url` into `destDir/<last path segment>`, return the local path. */
  def fetch(url: String,
            destDir: String = System.getProperty("java.io.tmpdir")): String = {
    val u = java.net.URI.create(url).toURL
    val name = new java.io.File(u.getPath).getName
    require(name.nonEmpty, s"URL has no file name: $url")
    val dest = Paths.get(destDir, name)
    val conn = u.openConnection().asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(true)
    conn.setConnectTimeout(30 * 1000)
    conn.setReadTimeout(10 * 60 * 1000)
    val code = conn.getResponseCode
    if (code / 100 != 2) {
      conn.disconnect()
      throw new IOException(s"GET $url failed: HTTP $code")
    }
    val expected = conn.getContentLengthLong
    val in = conn.getInputStream
    try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
    finally {
      in.close()
      conn.disconnect()
    }
    val got = Files.size(dest)
    if (expected >= 0 && got != expected)
      throw new IOException(
        s"truncated download of $url: got $got bytes, expected $expected")
    dest.toString
  }
}
