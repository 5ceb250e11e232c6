package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.chem.Chem
import graft.chem.Chem.{Atom, Mol}

/** Property tests for the D2/D3 chemistry kernels over RANDOM molecule
  * graphs — far past the hand cases and the generator's 80-class
  * lattice: random connected graphs (spanning tree + up to two ring
  * bonds, C/N/O/S, valence-legal double bonds), rendered from random
  * roots with random neighbor-order scrambles. The canonical form and
  * fingerprint must not see the rendering; parse∘write must preserve
  * the graph. Symmetric/regular graphs land in the canonicalizer's
  * branch-and-minimize tie-break path, which hand cases barely touch. */
object ChemProps extends Properties("chem") {

  private val valence = Map("C" -> 4, "N" -> 3, "O" -> 2, "S" -> 2)

  /** Valence-legal connected random molecule. */
  private val molGen: Gen[Mol] = for {
    n <- Gen.choose(2, 12)
    elems <- Gen.listOfN(n, Gen.frequency(5 -> "C", 2 -> "N", 2 -> "O", 1 -> "S"))
    parentPick <- Gen.listOfN(n, Gen.choose(0, 1000))
    ringPick <- Gen.listOfN(4, Gen.choose(0, 1000))
    doublePick <- Gen.listOfN(n + 4, Gen.choose(0, 3))
  } yield {
    val atoms = elems.map(e => Atom(e, aromatic = false, 0, -1)).toVector
    val used = new Array[Int](n)
    val bonds = Vector.newBuilder[(Int, Int, Int)]
    val adjacent = collection.mutable.Set[(Int, Int)]()
    var kept = 1 // atoms actually wired in (prefix)
    // spanning tree over the prefix with capacity; stop if stuck
    var i = 1
    var stuck = false
    while (i < n && !stuck) {
      val cands = (0 until kept).filter(j => used(j) < valence(atoms(j).element))
      if (cands.isEmpty) stuck = true
      else {
        val j = cands(parentPick(i) % cands.length)
        bonds += ((j, i, 1)); adjacent += ((math.min(i, j), math.max(i, j)))
        used(j) += 1; used(i) += 1
        kept += 1; i += 1
      }
    }
    // ring bonds between spare-capacity non-adjacent pairs
    ringPick.grouped(2).foreach {
      case Seq(p1, p2) if kept >= 3 =>
        val a = p1 % kept; val b = p2 % kept
        val k = (math.min(a, b), math.max(a, b))
        if (a != b && !adjacent(k) &&
            used(a) < valence(atoms(a).element) && used(b) < valence(atoms(b).element)) {
          bonds += ((k._1, k._2, 1)); adjacent += k
          used(a) += 1; used(b) += 1
        }
      case _ => ()
    }
    // upgrade some bonds to double where both ends have spare valence
    val b0 = bonds.result()
    val upgraded = b0.zipWithIndex.map { case ((x, y, o), bi) =>
      if (doublePick(bi % doublePick.length) == 0 &&
          used(x) < valence(atoms(x).element) && used(y) < valence(atoms(y).element)) {
        used(x) += 1; used(y) += 1; (x, y, 2)
      } else (x, y, o)
    }
    Mol(atoms.take(kept), upgraded.filter(b => b._1 < kept && b._2 < kept))
  }

  private val rendering: Gen[(Mol, Int, Int)] = for {
    m <- molGen
    start <- Gen.choose(0, 1000)
    scramble <- Gen.choose(1, 1000)
  } yield (m, start % m.atoms.length, scramble)

  property("D2 canonical form is rendering-invariant") = forAll(rendering) {
    case (m, start, scramble) =>
      val n = m.atoms.length
      val base = Chem.canonical(Chem.write(m, 0, identity))
      val alt = Chem.canonical(Chem.write(m, start, i => math.floorMod(i * scramble + 1, n)))
      base == alt
  }

  property("parse . write preserves atoms, bonds, and element multiset") = forAll(rendering) {
    case (m, start, scramble) =>
      val n = m.atoms.length
      val p = Chem.parse(Chem.write(m, start, i => math.floorMod(i * scramble, n)))
      p.atoms.length == n && p.bonds.length == m.bonds.length &&
        p.atoms.map(_.element).sorted == m.atoms.map(_.element).sorted &&
        p.bonds.map(_._3).sorted == m.bonds.map(_._3).sorted
  }

  property("D2 canonical output is a fixpoint") = forAll(molGen) { m =>
    val c = Chem.canonical(Chem.write(m, 0, identity))
    Chem.canonical(c) == c
  }

  property("D3 fingerprint is rendering-invariant and non-empty") = forAll(rendering) {
    case (m, start, scramble) =>
      val n = m.atoms.length
      val f1 = Chem.morganFp(Chem.write(m, 0, identity))
      val f2 = Chem.morganFp(Chem.write(m, start, i => math.floorMod(i * scramble + 2, n)))
      f1.toSeq == f2.toSeq && f1.map(java.lang.Long.bitCount(_)).sum > 0
  }

  // ------------------------------------------------------ stereo extension

  /** Random tetrahedral mark on an eligible carbon: random frame
    * permutation + random parity. Rendering-invariance of canonicalIso
    * then exercises the writer-frame/parser-frame agreement (including
    * ring-closure slots) far past the hand cases. */
  property("isomeric canonical is rendering-invariant under random tetrahedral marks") =
    forAll(rendering, Gen.choose(0, 1000), Gen.choose(1, 2)) {
      case ((m, start, scramble), pick, par) =>
        val n = m.atoms.length
        val elig = m.atoms.indices.filter { i =>
          m.atoms(i).element == "C" && m.adj(i).forall(_._2 == 1) &&
            (m.adj(i).length == 4 || m.adj(i).length == 3)
        }
        if (elig.isEmpty) true
        else {
          val a = elig(pick % elig.length)
          val base = m.adj(a).map(_._1).toVector ++
            (if (m.adj(a).length == 3) Vector(-1) else Vector.empty[Int])
          val perm = new scala.util.Random(pick).shuffle(base)
          val m2 = m.copy(stereo = Map(a -> ((par, perm))))
          val r1 = Chem.write(m2, 0, identity, iso = true)
          val r2 = Chem.write(m2, start, i => math.floorMod(i * scramble + 1, n), iso = true)
          val (c1, c2) = (Chem.canonicalIso(r1), Chem.canonicalIso(r2))
          // invariance, and: flipping the parity either changes the form
          // (a real stereocenter's mirror) or the mark was dropped as
          // false chirality — in which case no mark may survive
          val flip = Chem.canonicalIso(Chem.write(
            m.copy(stereo = Map(a -> ((3 - par, perm)))), 0, identity, iso = true))
          c1 == c2 && (flip != c1 || !c1.contains("@"))
        }
    }

  /** Random direction marks around a random double bond: resolveEz +
    * the writer's re-emission must be rendering-invariant, and
    * flipping one end's mark mirrors the geometry (or the descriptor
    * was validly dropped, in which case no mark survives). */
  property("isomeric canonical is rendering-invariant under random E/Z marks") =
    forAll(rendering, Gen.choose(0, 1000), Gen.choose(0, 1), Gen.choose(0, 1)) {
      case ((m, start, scramble), pick, da, db) =>
        val n = m.atoms.length
        def subs(end: Int, partner: Int): List[Int] =
          m.adj(end).collect { case (x, 1) if x != partner => x }
        val elig = m.bonds.filter { case (i, j, o) =>
          o == 2 && subs(i, j).nonEmpty && subs(j, i).nonEmpty
        }
        if (elig.isEmpty) true
        else {
          val (i, j, _) = elig(pick % elig.length)
          val (sa, sb) = (subs(i, j).head, subs(j, i).head)
          def dirKey(x: Int, end: Int, d: Int): ((Int, Int), Int) =
            (math.min(x, end), math.max(x, end)) -> (if (x < end) d else -d)
          def withDirs(d1: Int, d2: Int): Chem.Mol = Chem.resolveEz(
            m.copy(bondDirs = Map(dirKey(sa, i, d1), dirKey(sb, j, d2))))
          val m2 = withDirs(da * 2 - 1, db * 2 - 1)
          val r1 = Chem.write(m2, 0, identity, iso = true)
          val r2 = Chem.write(m2, start, k => math.floorMod(k * scramble + 1, n), iso = true)
          val (c1, c2) = (Chem.canonicalIso(r1), Chem.canonicalIso(r2))
          val flip = Chem.canonicalIso(Chem.write(
            withDirs(da * 2 - 1, 1 - db * 2), 0, identity, iso = true))
          c1 == c2 && (flip != c1 || !(c1.contains("/") || c1.contains("\\")))
        }
    }

  property("isomeric canonical output is a fixpoint on random stereo molecules") =
    forAll(rendering, Gen.choose(0, 1000)) { case ((m, start, scramble), pick) =>
      val n = m.atoms.length
      val r = Chem.write(m, start, i => math.floorMod(i * scramble + 1, n))
      val c = Chem.canonicalIso(r)
      Chem.canonicalIso(c) == c
    }

  /** Fuzz the drop-the-row boundary: arbitrary garbage must come back
    * null (or canonicalize, for accidentally-valid strings) — never
    * escape as any throwable other than the handled parse failure. A
    * stray MatchError/NPE/StackOverflow from the parser or writer
    * would fail a whole 100 TB job on one bad compound row. */
  /** Random isotope labels on random atoms: canonicalIso must not see
    * the rendering, and the FLAT canonical must equal the unlabeled
    * molecule's — the isotope-aware invariants are iso-path-only, so a
    * label can never steer the flat branch-and-minimize. */
  property("isotope labels: iso-canonical rendering-invariant, flat collapse exact") =
    forAll(rendering, Gen.listOfN(3, Gen.choose(0, 1000)), Gen.choose(0, 2)) {
      case ((m, start, scramble), picks, massPick) =>
        val n = m.atoms.length
        val mass = 13 + massPick
        val labeled = picks.foldLeft(m) { (acc, p) =>
          val at = p % n
          Mol(acc.atoms.updated(at, acc.atoms(at).copy(isotope = mass)),
            acc.bonds, acc.stereo, acc.bondDirs, acc.ez)
        }
        val r1 = Chem.write(labeled, 0, identity, iso = true)
        val r2 = Chem.write(labeled, start, i => math.floorMod(i * scramble + 1, n), iso = true)
        val iso1 = Chem.canonicalIso(r1)
        val iso2 = Chem.canonicalIso(r2)
        val flatUnlabeled = Chem.canonical(Chem.write(m, 0, identity))
        iso1 == iso2 && Chem.canonical(r1) == flatUnlabeled &&
          Chem.canonicalIso(iso1) == iso1
    }

  /** Aromaticity perception: any seed/variant/rendering of the
    * generator lattice canonicalizes to ONE aromatic form per cell,
    * perception is idempotent (a second normalize is a no-op), and the
    * canonical output is a fixpoint. */
  property("aromatize: renderings collapse, perception idempotent, canonical fixpoint") =
    forAll(Gen.choose(1L, 10000L), Gen.choose(0, 2), Gen.choose(0, 2)) { (seed, v1, v2) =>
      val a = Chem.canonical(Chem.aromFromSeed(seed, v1))
      val b = Chem.canonical(Chem.aromFromSeed(seed, v2))
      a == b && a.exists(_.isLower) && Chem.canonical(a) == a
    }

  /** Fused-system perception: any seed and any pair of renderings
    * (aromatic form, both Kekulé PHASES — which disagree on the shared
    * fusion bond's order) collapse, and the canonical output is an
    * aromatic fixpoint. Phase-independence is the whole contract:
    * per-ring Hückel counting provably cannot pass this property. */
  property("fused aromatize: phases collapse, perception idempotent, canonical fixpoint") =
    forAll(Gen.choose(1L, 10000L), Gen.choose(0, 2), Gen.choose(0, 2)) { (seed, v1, v2) =>
      val a = Chem.canonical(Chem.fusedFromSeed(seed, v1))
      val b = Chem.canonical(Chem.fusedFromSeed(seed, v2))
      a == b && a.exists(_.isLower) && Chem.canonical(a) == a
    }

  /** Pyrene-class perception: any seed and any pair of renderings
    * (perceived form, both full-Kekulé phases) collapse, the result is
    * partly aromatic, and perception is a canonical fixpoint. Every
    * generator system fails whole-system Hückel, so this property
    * passes ONLY through the per-ring fallback — and its phase pairs
    * differ on shared edges, so a phase-dependent fallback fails it. */
  property("poly aromatize: pyrene-class phases collapse, canonical fixpoint") =
    forAll(Gen.choose(1L, 10000L), Gen.choose(0, 2), Gen.choose(0, 2)) { (seed, v1, v2) =>
      val a = Chem.canonical(Chem.polyFromSeed(seed, v1))
      val b = Chem.canonical(Chem.polyFromSeed(seed, v2))
      a == b && a.exists(_.isLower) && Chem.canonical(a) == a
    }

  /** Explicit-zero / zero-padded isotope specifications are REJECTED
    * (canonical → null), never silently collapsed with the unlabeled
    * atom; the unpadded label parses — pins the r10 bracket-parser
    * rule (Chem.parseBracket's leading-zero fail). */
  property("zero-padded isotopes reject, unpadded parse") =
    forAll(Gen.choose(1, 999)) { mass =>
      Chem.canonicalIso(s"[0${mass}C]") == null &&
        Chem.canonicalIso("[0C]") == null &&
        Chem.canonicalIso(s"[${mass}C]") != null
    }

  /** Lactim→lactam: amide and lactim renderings of a seed collapse to
    * one keto-form fixpoint that still contains the C=O. */
  property("lactam tautomer: renderings collapse to an amide fixpoint") =
    forAll(Gen.choose(1L, 10000L), Gen.choose(0, 2), Gen.choose(0, 2)) { (seed, v1, v2) =>
      val a = Chem.canonical(Chem.lactamFromSeed(seed, v1))
      val b = Chem.canonical(Chem.lactamFromSeed(seed, v2))
      a == b && (a.contains("=O") || a.contains("O=")) && Chem.canonical(a) == a
    }

  property("kernels never throw on arbitrary input strings") = {
    val smilesAlphabet = Gen.oneOf("CNOSPcnos()[]@Hh+-=#/\\123456789%.FIBrl".toSeq)
    val garbage = Gen.oneOf(
      Gen.listOf(smilesAlphabet).map(_.mkString),      // SMILES-shaped noise
      Gen.asciiPrintableStr)                           // arbitrary ASCII
    forAll(garbage) { s =>
      val c = Chem.canonical(s)
      val i = Chem.canonicalIso(s)
      val f = Chem.morganFp(s)
      val sub = Chem.hasSubstructure(s, "C")
      // null-ness must agree across the kernels (one parse boundary),
      // and valid parses must canonicalize to a fixpoint
      (c == null) == (f == null) && (c == null) == (i == null) &&
        (c == null || Chem.canonical(c) == c) &&
        (i == null || Chem.canonicalIso(i) == i) &&
        (c != null || !sub)
    }
  }
}
