package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.etl.{Download, WikiXml}
import java.io.IOException
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

/** A1 network half against a loopback HTTP server (the image has no
  * egress; the code path is identical for a real mirror): a bz2 dump
  * fetched over HTTP parses exactly like the local file, a non-2xx
  * fails loudly, and a truncated body (Content-Length mismatch) is
  * rejected instead of being parsed partially. */
class DownloadSpec extends SparkTestBase {

  private def withServer(routes: Map[String, (Int, Array[Byte], Long)])
                        (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (code, bytes, declaredLen)) =>
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          ex.sendResponseHeaders(code, declaredLen)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def bz2Fixture: Array[Byte] = {
    val xml = Files.readAllBytes(
      Paths.get(getClass.getResource("/mini-wiki.xml").getPath))
    val bos = new java.io.ByteArrayOutputStream()
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val out = codec.createOutputStream(bos)
    out.write(xml)
    out.close()
    bos.toByteArray
  }

  test("dump fetched over HTTP parses identically to the local file") {
    val bytes = bz2Fixture
    withServer(Map("/dumps/mini-wiki.xml.bz2" ->
      ((200, bytes, bytes.length.toLong)))) { base =>
      val local = Download.fetch(s"$base/dumps/mini-wiki.xml.bz2")
      assert(local.endsWith("mini-wiki.xml.bz2"))
      val viaHttp = WikiXml.pages(spark, local).collect().map(_.toSeq).toSet
      val direct = WikiXml.pages(spark,
        getClass.getResource("/mini-wiki.xml").getPath)
        .collect().map(_.toSeq).toSet
      assert(viaHttp == direct && direct.size == 6)
    }
  }

  test("redirects are followed manually (the http→https mirror case)") {
    val bytes = bz2Fixture
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    server.createContext("/old/mini-wiki.xml.bz2", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getResponseHeaders.add("Location",
          s"http://127.0.0.1:$port/new/mini-wiki.xml.bz2")
        ex.sendResponseHeaders(301, -1)
        ex.close()
      }
    })
    server.createContext("/new/mini-wiki.xml.bz2", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val local = Download.fetch(s"http://127.0.0.1:$port/old/mini-wiki.xml.bz2")
      assert(Files.size(Paths.get(local)) == bytes.length.toLong)
    } finally server.stop(0)
  }

  test("non-2xx responses fail loudly") {
    withServer(Map("/missing.xml.bz2" ->
      ((404, "not here".getBytes, 8L)))) { base =>
      val e = intercept[IOException](Download.fetch(s"$base/missing.xml.bz2"))
      assert(e.getMessage.contains("404"))
    }
  }

  test("truncated transfer (Content-Length mismatch) is rejected") {
    val bytes = bz2Fixture
    // declare 100 extra bytes the server never sends
    withServer(Map("/trunc.xml.bz2" ->
      ((200, bytes, bytes.length.toLong + 100)))) { base =>
      val e = intercept[IOException](Download.fetch(s"$base/trunc.xml.bz2"))
      assert(e.getMessage.contains("truncated"))
    }
  }
}
