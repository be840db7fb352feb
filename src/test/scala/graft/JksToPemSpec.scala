package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.security.KeyFactory
import java.security.cert.CertificateFactory
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.JksToPem

/** JKS → PEM conversion (util/common.go:209-250). The fixture keystore is
  * generated with the JDK's own keytool (present wherever a JVM is), then
  * the emitted PEM is parsed back through the standard JCA factories.
  */
class JksToPemSpec extends AnyFunSuite {

  private def genJks(path: String, password: String): Boolean = {
    val cmd = Array("keytool", "-genkeypair", "-alias", "sinker",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
      "-dname", "CN=sinker-test, O=graft", "-keystore", path,
      "-storetype", "JKS", "-storepass", password, "-keypass", password,
      "-noprompt")
    new ProcessBuilder(cmd: _*).redirectErrorStream(true).start().waitFor() == 0
  }

  private def pemBlocks(text: String, kind: String): Seq[Array[Byte]] =
    s"-----BEGIN $kind-----([\\s\\S]*?)-----END $kind-----".r
      .findAllMatchIn(text)
      .map(m => Base64.getMimeDecoder.decode(m.group(1)))
      .toSeq

  test("key entry converts to certificate + PKCS#8 key PEM, round-trips JCA") {
    val dir = Files.createTempDirectory("jks").toFile
    dir.deleteOnExit()
    val jks = new java.io.File(dir, "client.jks").getPath
    assume(genJks(jks, "changeit"), "keytool unavailable")

    val out = JksToPem.convert(jks, "changeit")
    assert(out.certPem.getFileName.toString === "client.jks.cert.pem")
    assert(out.keyPem.getFileName.toString === "client.jks.key.pem")

    val certText = new String(Files.readAllBytes(out.certPem), UTF_8)
    val certs = pemBlocks(certText, "CERTIFICATE")
    assert(certs.size === 1)
    val cert = CertificateFactory.getInstance("X.509")
      .generateCertificate(new ByteArrayInputStream(certs.head))
      .asInstanceOf[java.security.cert.X509Certificate]
    assert(cert.getSubjectX500Principal.getName.contains("CN=sinker-test"))

    val keyText = new String(Files.readAllBytes(out.keyPem), UTF_8)
    val keyDer = pemBlocks(keyText, "PRIVATE KEY")
    assert(keyDer.size === 1)
    val key = KeyFactory.getInstance("RSA")
      .generatePrivate(new PKCS8EncodedKeySpec(keyDer.head))
    assert(key.getAlgorithm === "RSA")
    // the key matches the certificate's public modulus
    assert(key.asInstanceOf[java.security.interfaces.RSAPrivateKey].getModulus ===
      cert.getPublicKey.asInstanceOf[java.security.interfaces.RSAPublicKey].getModulus)
  }

  test("overwrite=false returns existing paths untouched (common.go:222-227)") {
    val dir = Files.createTempDirectory("jks2").toFile
    dir.deleteOnExit()
    val jks = new java.io.File(dir, "ts.jks").getPath
    val sentinel = Paths.get(jks + ".cert.pem")
    Files.write(sentinel, "sentinel".getBytes(UTF_8))
    // no keystore even exists — the short-circuit must win before load
    val out = JksToPem.convert(jks, "pw", overwrite = false)
    assert(new String(Files.readAllBytes(out.certPem), UTF_8) === "sentinel")
  }
}
