package graft.http

import java.security.{KeyFactory, KeyStore}
import java.security.spec.{InvalidKeySpecException, PKCS8EncodedKeySpec}
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS support for the Riemann TCP transport — the reference enables TLS
  * when `key`/`cert`/`cacert` are all configured (`tcp.clj:150-153,
  * 176-182`, building an SSLContext from the PEM files via less-awful-ssl)
  * and requires client certificates (`tcp.clj:110-117`,
  * `.setNeedClientAuth true` — mutual TLS, not just server auth).
  *
  * This is the JDK equivalent: PKCS#8 PEM key + X.509 PEM cert chain +
  * PEM CA bundle → in-memory PKCS12 stores → `SSLContext`. Pure
  * `java.security`/`javax.net.ssl`, no dependencies. The same context
  * builder serves both the server side and test clients (the reference's
  * client also authenticates with a cert from the same CA).
  */
object Tls {

  /** PEM file paths, named after the reference's TCP config keys. */
  final case class Config(key: String, cert: String, cacert: String)

  def sslContext(cfg: Config): SSLContext = {
    val keyManagers = {
      val ks = emptyStore()
      ks.setKeyEntry("key", privateKey(cfg.key), Array.emptyCharArray,
        certificates(cfg.cert).toArray)
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, Array.emptyCharArray)
      kmf.getKeyManagers
    }
    val trustManagers = {
      val ts = emptyStore()
      certificates(cfg.cacert).zipWithIndex.foreach { case (c, i) =>
        ts.setCertificateEntry(s"ca-$i", c)
      }
      val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ts)
      tmf.getTrustManagers
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers, trustManagers, null)
    ctx
  }

  private def emptyStore(): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks
  }

  /** Every `BEGIN CERTIFICATE` block in the file (chain or CA bundle) —
    * `CertificateFactory` consumes PEM natively.
    */
  private def certificates(path: String): Seq[java.security.cert.Certificate] = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try {
      import scala.jdk.CollectionConverters._
      cf.generateCertificates(in).asScala.toSeq
    } finally in.close()
  }

  /** A PKCS#8 `BEGIN PRIVATE KEY` PEM block (the modern openssl default);
    * tries RSA then EC key factories.
    */
  private def privateKey(path: String): java.security.PrivateKey = {
    val pem = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val b64 = pem.linesIterator
      .dropWhile(!_.contains("BEGIN PRIVATE KEY")).drop(1)
      .takeWhile(!_.contains("END PRIVATE KEY"))
      .mkString
    require(b64.nonEmpty,
      s"$path: no PKCS#8 'BEGIN PRIVATE KEY' block (convert legacy keys with openssl pkcs8)")
    val spec = new PKCS8EncodedKeySpec(java.util.Base64.getMimeDecoder.decode(b64))
    try KeyFactory.getInstance("RSA").generatePrivate(spec)
    catch {
      case _: InvalidKeySpecException => KeyFactory.getInstance("EC").generatePrivate(spec)
    }
  }
}
