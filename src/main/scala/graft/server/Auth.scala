package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Users, per-user API keys, and per-KG ACLs (reference `src/auth.rs`:
  * global admin/editor/viewer roles, argon2id password hashes, random
  * 64-hex API keys stored hashed, and `kg_acls(kg, user, role)` rows
  * with owner/editor/viewer per knowledge graph; admins are implicit
  * owners of every KG, other users need an explicit grant —
  * `protocol/handler.rs:1698-1736`).
  *
  * Passwords hash with PBKDF2-HmacSHA256 (the JDK's built-in slow KDF;
  * the reference uses argon2id — same role: salted, deliberately
  * expensive). All state is in-memory and thread-safe; the server owns
  * persistence policy (the reference persists into an `_internal` KG).
  */
object Auth {
  /** An authenticated caller: `user` is None for bare service keys
    * (API keys not bound to a user) — those skip per-KG ACLs and are
    * gated by the global role only. */
  final case class Identity(user: Option[String], role: String)
}

final class Auth {
  import Auth.Identity

  final case class User(name: String, hash: Array[Byte], salt: Array[Byte], role: String)

  private val users = new java.util.concurrent.ConcurrentHashMap[String, User]()
  // sha256(key)hex -> (label, role, user)
  private val keys =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, Option[String])]()
  // (kg, user) -> owner|editor|viewer
  private val kgAcls = new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  val Roles = Set("admin", "editor", "viewer")
  val KgRoles = Set("owner", "editor", "viewer")

  private val rng = new java.security.SecureRandom()

  private def pbkdf2(password: String, salt: Array[Byte]): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, 100000, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  private def sha256hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes(UTF_8))
      .map(b => f"$b%02x").mkString

  // ------------------------------------------------------------- users

  def createUser(name: String, password: String, role: String): Either[String, Unit] = {
    if (!Roles(role)) return Left(s"Unknown role '$role'. Valid roles: admin, editor, viewer")
    if (name.isEmpty || !name.forall(c => c.isLetterOrDigit || c == '_' || c == '-'))
      return Left(s"Invalid username '$name'")
    val salt = new Array[Byte](16)
    rng.nextBytes(salt)
    val u = User(name, pbkdf2(password, salt), salt, role)
    if (users.putIfAbsent(name, u) != null) Left(s"User '$name' already exists")
    else Right(())
  }

  def dropUser(name: String): Either[String, Unit] =
    if (users.remove(name) == null) Left(s"Unknown user '$name'")
    else {
      // revoke the user's keys and ACL entries with them
      keys.entrySet.removeIf(e => e.getValue._3.contains(name))
      kgAcls.keySet.removeIf(_._2 == name)
      Right(())
    }

  def setPassword(name: String, password: String): Either[String, Unit] =
    Option(users.get(name)) match {
      case None => Left(s"Unknown user '$name'")
      case Some(u) =>
        val salt = new Array[Byte](16)
        rng.nextBytes(salt)
        users.put(name, u.copy(hash = pbkdf2(password, salt), salt = salt))
        Right(())
    }

  def setRole(name: String, role: String): Either[String, Unit] =
    if (!Roles(role)) Left(s"Unknown role '$role'")
    else Option(users.get(name)) match {
      case None => Left(s"Unknown user '$name'")
      case Some(u) => users.put(name, u.copy(role = role)); Right(())
    }

  def verifyPassword(name: String, password: String): Option[Identity] =
    Option(users.get(name)).filter(u =>
      MessageDigest.isEqual(u.hash, pbkdf2(password, u.salt)))
      .map(u => Identity(Some(u.name), u.role))

  def listUsers: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    users.values.asScala.toSeq.sortBy(_.name).map(u => (u.name, u.role))
  }

  // -------------------------------------------------------------- keys

  /** Mint a key for `user` (or a bare service key when None, using
    * `role` directly). Returns the plaintext key — shown once. */
  def createKey(label: String, user: Option[String], role: String): Either[String, String] = {
    val effRole = user match {
      case Some(n) => Option(users.get(n)) match {
        case None => return Left(s"Unknown user '$n'")
        case Some(u) => u.role
      }
      case None => role
    }
    val bytes = new Array[Byte](32)
    rng.nextBytes(bytes)
    val key = bytes.map(b => f"$b%02x").mkString
    keys.put(sha256hex(key), (label, effRole, user))
    Right(key)
  }

  def revokeKey(label: String): Boolean =
    keys.entrySet.removeIf(_.getValue._1 == label)

  def listKeys: Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    keys.values.asScala.toSeq.sortBy(_._1)
      .map { case (label, role, user) => (label, role, user.getOrElse("-")) }
  }

  /** Resolve a plaintext key to an identity. Keys bound to a user read
    * the user's CURRENT role (a role change applies immediately; a
    * dropped user's keys are gone). */
  def identify(key: String): Option[Identity] =
    Option(keys.get(sha256hex(key))).flatMap { case (_, keyRole, user) =>
      user match {
        case Some(n) => Option(users.get(n)).map(u => Identity(Some(n), u.role))
        case None => Some(Identity(None, keyRole))
      }
    }

  // --------------------------------------------------------------- ACLs

  def grant(kg: String, user: String, kgRole: String): Either[String, Unit] =
    if (!KgRoles(kgRole)) Left(s"Unknown KG role '$kgRole'. Valid roles: owner, editor, viewer")
    else if (!users.containsKey(user)) Left(s"Unknown user '$user'")
    else { kgAcls.put((kg, user), kgRole); Right(()) }

  def revoke(kg: String, user: String): Boolean =
    kgAcls.remove((kg, user)) != null

  def aclsFor(kg: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    kgAcls.asScala.toSeq.collect { case ((k, u), r) if k == kg => (u, r) }.sortBy(_._1)
  }

  /** Per-KG role: admins are implicit owners of every KG; other USERS
    * need an explicit grant (None = no access). Service keys (no user)
    * are not KG-gated — the caller skips this check for them. */
  def kgRoleFor(kg: String, ident: Identity): Option[String] = ident match {
    case Identity(_, "admin") => Some("owner")
    case Identity(Some(u), _) => Option(kgAcls.get((kg, u)))
    case Identity(None, _) => Some("editor") // service key: global role gates
  }
}
