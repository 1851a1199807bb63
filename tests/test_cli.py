"""CLI operator-flow test: the single-party equivalent of the
reference's demo/mixnet check harness driving the installed commands
(reference: SURVEY.md §4 tier 3)."""

import json
import os
import subprocess
import sys

import pytest

from vmn_tpu.cli import main as vtm
from vmn_tpu.cli import vbt, vmn, vmnc, vmnd, vmni, vmnv, vre

GROUP = "named:test256"


def test_cli_full_flow(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    # --- vmni: protocol stub + party + merge ---------------------------
    assert vmni.main([
        "-prot", "-sid", "CliTest", "-nopart", "1", "-thres", "1",
        "-pgroup", GROUP, "-stub", "stub.xml",
    ]) == 0
    assert vmni.main([
        "-party", "-name", "Party01", "-stub", "stub.xml",
        "-dir", str(tmp_path / "p1"), "-seed", "",
        "-out", "localProtInfo.xml",
    ]) == 0
    assert vmni.main([
        "-merge", "localProtInfo.xml", "-out", "protInfo.xml",
    ]) == 0

    # deterministic seed for the party
    (tmp_path / "seed").write_bytes(b"cli-seed")
    priv = (tmp_path / "privInfo.xml").read_text()
    priv = priv.replace("<seed />", f"<seed>{tmp_path}/seed</seed>")
    priv = priv.replace("<seed></seed>", f"<seed>{tmp_path}/seed</seed>")
    (tmp_path / "privInfo.xml").write_text(priv)

    # --- vmn -keygen ---------------------------------------------------
    assert vmn.main([
        "-keygen", "privInfo.xml", "protInfo.xml", "publicKey.bt",
    ]) == 0
    assert (tmp_path / "publicKey.bt").exists()

    # --- vmnd -ciphs ---------------------------------------------------
    assert vmnd.main([
        "-ciphs", "publicKey.bt", "ciphertexts.bt", "-N", "5",
        "-pgroup", GROUP,
    ]) == 0

    # --- vmnc: convert ciphertexts raw -> json -> raw ------------------
    assert vmnc.main([
        "-ciphs", "ciphertexts.bt", "ciphertexts.json",
        "-ini", "raw", "-outi", "json", "-pgroup", GROUP,
    ]) == 0
    assert vmnc.main([
        "-ciphs", "ciphertexts.json", "ciphertexts2.bt",
        "-ini", "json", "-outi", "raw", "-pgroup", GROUP,
    ]) == 0
    assert (
        (tmp_path / "ciphertexts.bt").read_bytes()
        == (tmp_path / "ciphertexts2.bt").read_bytes()
    )

    # --- vre: slice and concatenate ------------------------------------
    assert vre.main([
        "-ciphs", "-sub", "0", "3", "ciphertexts.bt", "front.bt",
    ]) == 0
    assert vre.main([
        "-ciphs", "-sub", "3", "5", "ciphertexts.bt", "back.bt",
    ]) == 0
    assert vre.main([
        "-ciphs", "-cat", "front.bt", "back.bt", "rejoined.bt",
    ]) == 0
    assert (
        (tmp_path / "rejoined.bt").read_bytes()
        == (tmp_path / "ciphertexts.bt").read_bytes()
    )

    # --- vmn -mix ------------------------------------------------------
    assert vmn.main([
        "-mix", "privInfo.xml", "protInfo.xml", "ciphertexts.bt",
        "plaintexts.bt",
    ]) == 0

    # --- vmnv ----------------------------------------------------------
    nizkp = str(tmp_path / "p1" / "nizkp.default")
    assert vmnv.main(["protInfo.xml", nizkp, "-mix", "-v"]) == 0

    # --- vbt -----------------------------------------------------------
    assert vbt.main(["plaintexts.bt"]) == 0

    # --- vtm dispatcher ------------------------------------------------
    assert vtm.main(["vbt", "plaintexts.bt"]) == 0
    assert vtm.main(["bogus"]) == 2


def test_sact_lact_roundtrip(tmp_path, monkeypatch, capsys):
    """`vmn -sact` then `-lact` must report the PERSISTED active set
    (reference: MixNetElGamalTool.java:676-699).  Regression: -lact
    used to print before loading the `.active` file."""
    monkeypatch.chdir(tmp_path)
    assert vmni.main([
        "-prot", "-sid", "ActTest", "-nopart", "3", "-thres", "2",
        "-pgroup", GROUP, "-stub", "stub.xml",
    ]) == 0
    locals_ = []
    for i in (1, 2, 3):
        assert vmni.main([
            "-party", "-name", f"Party{i:02d}", "-stub", "stub.xml",
            "-dir", str(tmp_path / f"p{i}"), "-seed", "",
            "-out", f"local{i}.xml",
            "-http", f"http://127.0.0.1:{8040 + i}",
            "-hint", f"127.0.0.1:{4040 + i}",
        ]) == 0
        (tmp_path / "privInfo.xml").rename(tmp_path / f"priv{i}.xml")
        locals_.append(f"local{i}.xml")
    assert vmni.main(["-merge", *locals_, "-out", "protInfo.xml"]) == 0

    # default: all active
    assert vmn.main(["-lact", "priv1.xml", "protInfo.xml"]) == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "1,2,3"

    assert vmn.main(["-sact", "1,3", "priv1.xml", "protInfo.xml"]) == 0
    capsys.readouterr()
    assert vmn.main(["-lact", "priv1.xml", "protInfo.xml"]) == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "1,3"


@pytest.mark.skipif(os.environ.get("VMN_SKIP_SLOW") == "1",
                    reason="slow N=10^4 config")
def test_manyciphs_cli_e2e(tmp_path, monkeypatch):
    """N=10^4 through the CLI (reference: `manyciphs` config,
    .checkbaseconf NO_CIPHERTEXTS=10000)."""
    monkeypatch.chdir(tmp_path)
    _cli_protinfo(tmp_path)
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    assert vmnd.main(["-ciphs", "publicKey.bt", "ciphertexts.bt",
                      "-N", "10000", "-pgroup", GROUP]) == 0
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts.bt"]) == 0
    nizkp = str(tmp_path / "p1" / "nizkp.default")
    assert vmnv.main(["protInfo.xml", nizkp, "-mix"]) == 0


def test_forcedwidth_cli(tmp_path, monkeypatch):
    """-width on the vmn command line overrides the protInfo width
    (reference: `forcedwidth` config; macros widthcom -> `vmn -width`)."""
    monkeypatch.chdir(tmp_path)
    _cli_protinfo(tmp_path)
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    assert vmnd.main(["-ciphs", "publicKey.bt", "ciphertexts.bt",
                      "-N", "5", "-width", "2", "-pgroup", GROUP]) == 0
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts.bt",
                     "-width", "2"]) == 0
    nizkp = str(tmp_path / "p1" / "nizkp.default")
    assert vmnv.main(["protInfo.xml", nizkp, "-mix",
                      "-width", "2"]) == 0
    # wrong expected width must be rejected
    assert vmnv.main(["protInfo.xml", nizkp, "-mix",
                      "-width", "3"]) != 0


def test_forcedmaxciph_cli(tmp_path, monkeypatch):
    """-maxciph on the command line overrides the protInfo value
    (reference: `forcedmaxciph` config: MAX=200 in protInfo forced to
    300 at precomp+mix time)."""
    monkeypatch.chdir(tmp_path)
    _cli_protinfo(tmp_path, extra=["-maxciph", "6"])
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    # forced maxciph 12 > protInfo's 6; N=10 only fits the forced value
    assert vmn.main(["-precomp", "privInfo.xml", "protInfo.xml",
                     "-maxciph", "12"]) == 0
    assert vmnd.main(["-ciphs", "publicKey.bt", "ciphertexts.bt",
                      "-N", "10", "-pgroup", GROUP]) == 0
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts.bt",
                     "-maxciph", "12"]) == 0
    nizkp = str(tmp_path / "p1" / "nizkp.default")
    assert vmnv.main(["protInfo.xml", nizkp, "-mix"]) == 0


def test_seq_interfaces_cli(tmp_path, monkeypatch):
    """seqhex input / seqjson output driven through vmnc + vmn
    (reference: interface plug-in matrix, `raw/json/jsondecode` configs
    extended by the seq* interfaces)."""
    monkeypatch.chdir(tmp_path)
    _cli_protinfo(tmp_path)
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    assert vmnd.main(["-ciphs", "publicKey.bt", "ciphertexts.bt",
                      "-N", "5", "-pgroup", GROUP]) == 0
    assert vmnc.main(["-ciphs", "ciphertexts.bt", "ciphertexts.seqhex",
                      "-ini", "raw", "-outi", "seqhex",
                      "-pgroup", GROUP]) == 0
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.seqhex", "plaintexts.seqjson",
                     "-ini", "seqhex", "-outi", "seqjson"]) == 0
    # output parses as seqjson and round-trips to raw
    assert vmnc.main(["-plain", "plaintexts.seqjson", "plaintexts.bt",
                      "-ini", "seqjson", "-outi", "raw",
                      "-pgroup", GROUP]) == 0
    nizkp = str(tmp_path / "p1" / "nizkp.default")
    assert vmnv.main(["protInfo.xml", nizkp, "-mix"]) == 0


def _cli_protinfo(tmp_path, extra=()):
    """vmni protocol+party+merge with a deterministic seed."""
    assert vmni.main([
        "-prot", "-sid", "CliTest", "-nopart", "1", "-thres", "1",
        "-pgroup", GROUP, "-stub", "stub.xml", *extra,
    ]) == 0
    assert vmni.main([
        "-party", "-name", "Party01", "-stub", "stub.xml",
        "-dir", str(tmp_path / "p1"), "-seed", "",
        "-out", "localProtInfo.xml",
    ]) == 0
    assert vmni.main([
        "-merge", "localProtInfo.xml", "-out", "protInfo.xml",
    ]) == 0
    (tmp_path / "seed").write_bytes(b"cli-seed")
    priv = (tmp_path / "privInfo.xml").read_text()
    priv = priv.replace("<seed />", f"<seed>{tmp_path}/seed</seed>")
    priv = priv.replace("<seed></seed>", f"<seed>{tmp_path}/seed</seed>")
    (tmp_path / "privInfo.xml").write_text(priv)
