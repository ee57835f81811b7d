package graft.lake

import java.nio.file.{Files, Paths}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Secret source (SURVEY.md §2.1 S6): the reference resolves its service
  * principal secret from Key Vault
  * (`/root/reference/ingestion-datalake.py:26-31`,
  * `SecretClient.get_secret("sp-secret")`). That is a config-plane lookup,
  * not a dataflow — the engine models it as a trait with local
  * implementations (env vars, properties file, in-memory map) and a
  * fallback chain; a cloud deployment adds a vault-backed implementation
  * without touching query code. Never logged, never serialized into tasks.
  */
trait SecretProvider {
  /** Resolve a secret by name; None when this provider has no binding. */
  def secret(name: String): Option[String]

  final def secretOrThrow(name: String): String =
    secret(name).getOrElse(
      throw new NoSuchElementException(s"secret '$name' not found"))
}

/** Environment-variable provider: secret `sp-secret` resolves from
  * `PREFIX_SP_SECRET` (name upper-cased, `-`/`.` mapped to `_`). */
final class EnvSecretProvider(prefix: String = "",
    env: Map[String, String] = sys.env) extends SecretProvider {
  private def key(name: String) =
    (prefix + name).toUpperCase.replaceAll("[-.]", "_")
  def secret(name: String): Option[String] = env.get(key(name))
}

/** Java-properties-file provider (the local stand-in for a vault). */
final class PropsFileSecretProvider(path: String) extends SecretProvider {
  private val props: Properties = {
    val p = new Properties()
    val in = Files.newInputStream(Paths.get(path))
    try p.load(in) finally in.close()
    p
  }
  def secret(name: String): Option[String] = Option(props.getProperty(name))
  def names: Set[String] = props.stringPropertyNames().asScala.toSet
}

/** In-memory provider (tests / explicit config). */
final case class InMemorySecretProvider(secrets: Map[String, String])
    extends SecretProvider {
  def secret(name: String): Option[String] = secrets.get(name)
}

object SecretProviders {
  /** First-match fallback chain, like the reference's env → vault order. */
  def chain(providers: SecretProvider*): SecretProvider = new SecretProvider {
    def secret(name: String): Option[String] =
      providers.iterator.flatMap(_.secret(name)).nextOption()
  }
}
