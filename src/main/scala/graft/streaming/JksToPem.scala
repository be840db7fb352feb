package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.security.KeyStore
import java.util.Base64

/** JKS → PEM conversion for Kafka TLS configs (util/common.go:209-250):
  * clients that need PEM material (certificate chain + PKCS#8 private
  * key) from a Java keystore. The reference shells out to
  * `keytool -importkeystore` + two `openssl pkcs12` passes; the JVM can
  * do the same conversion in-process via [[java.security.KeyStore]] —
  * same outputs (`<jks>.cert.pem`, `<jks>.key.pem` beside the input,
  * `overwrite=false` short-circuits when either target exists), no
  * subprocesses, no intermediate .p12 on disk.
  */
object JksToPem {

  final case class PemPaths(certPem: Path, keyPem: Path)

  def convert(jksPath: String, password: String, overwrite: Boolean = false): PemPaths = {
    val src = Paths.get(jksPath)
    val certPem = src.resolveSibling(src.getFileName.toString + ".cert.pem")
    val keyPem = src.resolveSibling(src.getFileName.toString + ".key.pem")
    if (!overwrite && (Files.exists(certPem) || Files.exists(keyPem)))
      return PemPaths(certPem, keyPem)

    val ks = KeyStore.getInstance("JKS")
    val in = Files.newInputStream(src)
    try ks.load(in, password.toCharArray) finally in.close()

    val certs = new StringBuilder
    val keys = new StringBuilder
    val aliases = ks.aliases()
    while (aliases.hasMoreElements) {
      val alias = aliases.nextElement()
      if (ks.isKeyEntry(alias)) {
        // key entries carry their own certificate chain
        Option(ks.getCertificateChain(alias)).toSeq.flatten
          .foreach(c => certs ++= pemBlock("CERTIFICATE", c.getEncoded))
        ks.getKey(alias, password.toCharArray) match {
          case k: java.security.PrivateKey =>
            // getEncoded is PKCS#8 for JCA private keys — the unencrypted
            // form openssl's `-nodes` pass emits
            keys ++= pemBlock("PRIVATE KEY", k.getEncoded)
          case _ => // secret (symmetric) keys have no PEM form
        }
      } else if (ks.isCertificateEntry(alias)) {
        certs ++= pemBlock("CERTIFICATE", ks.getCertificate(alias).getEncoded)
      }
    }
    Files.write(certPem, certs.toString.getBytes(UTF_8))
    Files.write(keyPem, keys.toString.getBytes(UTF_8))
    PemPaths(certPem, keyPem)
  }

  private def pemBlock(kind: String, der: Array[Byte]): String = {
    val b64 = Base64.getEncoder.encodeToString(der).grouped(64).mkString("\n")
    s"-----BEGIN $kind-----\n$b64\n-----END $kind-----\n"
  }
}
