package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{KeyExchange, Provision}

/** Node provisioning (the C4 fringe): the password-protected key store
  * round-trips into a working KeyExchange identity, wrong passwords and
  * tampering fail the GCM tag cleanly, and the layout validator enforces
  * the reference wrapper's output contract (one artifact per extension,
  * consistent node ids). */
class ProvisionSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("provision").toString

  test("provision -> load round-trips a usable identity") {
    val base = tmp()
    val pw = "correct horse battery".toCharArray
    val dir = Provision.provision(base, "node-a", pw)
    // layout contract
    assert(Provision.validate(dir.toString) == Right("node-a"))
    // the store opens and the identity actually signs: announce + readback
    val id = Provision.load(dir.toString, "correct horse battery".toCharArray)
    val seed = Files.readString(dir.resolve("node-a.seed"))
    assert(seed.contains(id.fingerprint), "seed must pin the fingerprint")
    val topic = tmp() + "/topic"
    KeyExchange.announce(topic, "node-a", id)
    val anns = KeyExchange.announcements(topic)
    assert(anns.contains("node-a"))
    assert(anns("node-a").fingerprint == id.fingerprint)
    // private store is owner-only where POSIX permissions exist
    val perms = java.nio.file.Files.getPosixFilePermissions(
      dir.resolve("node-a.crypto"))
    import java.nio.file.attribute.PosixFilePermission._
    assert(!perms.contains(GROUP_READ) && !perms.contains(OTHERS_READ),
      s"crypto store must be 0600, got $perms")
  }

  test("wrong password and tampering fail closed") {
    val base = tmp()
    val dir = Provision.provision(base, "node-b", "hunter2hunter2".toCharArray)
    val e1 = intercept[IllegalArgumentException] {
      Provision.load(dir.toString, "wrong password".toCharArray)
    }
    assert(e1.getMessage.contains("wrong password or corrupted store"))
    // flip one ciphertext byte: GCM must reject, never partially decrypt
    val store = dir.resolve("node-b.crypto")
    val b = Files.readAllBytes(store)
    b(b.length - 5) = (b(b.length - 5) ^ 0x20).toByte
    Files.write(store, b)
    val e2 = intercept[IllegalArgumentException] {
      Provision.load(dir.toString, "hunter2hunter2".toCharArray)
    }
    assert(e2.getMessage.contains("wrong password or corrupted store"))
  }

  test("a store cannot be replayed under another node's name (GCM AAD)") {
    val base = tmp()
    val dir = Provision.provision(base, "node-c", "pw-pw-pw-pw".toCharArray)
    // rename every artifact to a different node id, fix the config so the
    // LAYOUT validates — the sealed store must still refuse (AAD = node id)
    val evil = java.nio.file.Paths.get(base).resolve("node-x")
    Files.createDirectories(evil)
    for (ext <- Seq(".seed", ".crypto"))
      Files.copy(dir.resolve(s"node-c$ext"), evil.resolve(s"node-x$ext"))
    Files.writeString(evil.resolve("node-x.config"),
      "[DEFAULT]\nnode_id = node-x\nfingerprint = forged\n")
    val e = intercept[IllegalArgumentException] {
      Provision.load(evil.toString, "pw-pw-pw-pw".toCharArray)
    }
    assert(e.getMessage.contains("wrong password or corrupted store"))
  }

  test("validate enforces the wrapper's move_files contract") {
    val base = tmp()
    val dir = Provision.provision(base, "node-d", "a strong one".toCharArray)
    assert(Provision.validate(dir.toString) == Right("node-d"))
    // duplicate .config
    Files.writeString(dir.resolve("other.config"), "[DEFAULT]\nnode_id = other\n")
    assert(Provision.validate(dir.toString).swap.exists(_.contains("2 .config")))
    Files.delete(dir.resolve("other.config"))
    // stem mismatch
    Files.move(dir.resolve("node-d.seed"), dir.resolve("misnamed.seed"))
    assert(Provision.validate(dir.toString).swap.exists(_.contains("conflicts")))
    Files.move(dir.resolve("misnamed.seed"), dir.resolve("node-d.seed"))
    // config disagrees with filenames
    Files.writeString(dir.resolve("node-d.config"),
      "[DEFAULT]\nnode_id = somebody-else\n")
    assert(Provision.validate(dir.toString).swap.exists(_.contains("mismatched")))
    // node_id missing entirely
    Files.writeString(dir.resolve("node-d.config"), "[DEFAULT]\nkdf = x\n")
    assert(Provision.validate(dir.toString).swap.exists(_.contains("not listed")))
  }

  test("provisioning never overwrites an existing node") {
    val base = tmp()
    Provision.provision(base, "node-e", "passpasspass".toCharArray)
    intercept[IllegalArgumentException] {
      Provision.provision(base, "node-e", "passpasspass".toCharArray)
    }
  }
}
