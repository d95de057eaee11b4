"""Generator CLI + RunGen harness (reference: tools/GenGen.cpp,
tools/RunGen.h; Appendix B CLI surfaces)."""
import json
import os

import numpy as np
import pytest

from halide_tpu.tools import gen as gen_cli
from halide_tpu.tools import rungen as rungen_cli


def test_gen_emits(tmp_path):
    rc = gen_cli.main(["-g", "blur", "-o", str(tmp_path),
                       "-e", "hlpipe,stmt,metadata,stmt_html",
                       "width=64", "height=48"])
    assert rc == 0
    assert (tmp_path / "blur.hlpipe").exists()
    assert (tmp_path / "blur.stmt").exists()
    assert (tmp_path / "blur.metadata.json").exists()
    assert (tmp_path / "blur.stmt.html").exists()
    meta = json.loads((tmp_path / "blur.metadata.json").read_text())
    assert meta["inputs"][0]["name"] == "input"
    # the serialized pipeline reloads and runs
    import halide_tpu as hl
    pipe, images, _ = hl.deserialize_pipeline(
        (tmp_path / "blur.hlpipe").read_text())
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 14, (48, 64), np.uint16)
    images["input"].set(img)
    out = pipe.realize([62, 46]).to_numpy()
    ref = (img[:, :-2].astype(np.uint16) + img[:, 1:-1] + img[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    np.testing.assert_array_equal(out, ref)


def test_gen_list(capsys):
    rc = gen_cli.main(["--list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "blur" in out and "camera_pipe" in out


def test_rungen_describe(capsys):
    rc = rungen_cli.main(["blur", "--describe", "width=64", "height=48"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["name"] == "blur"


def test_rungen_run_and_output(tmp_path, capsys):
    out_file = str(tmp_path / "o.npy")
    rc = rungen_cli.main(["blur", "width=64", "height=48",
                          "input=random:7", "--output", out_file,
                          "--parsable_output"])
    assert rc == 0
    arr = np.load(out_file)
    assert arr.shape == (46, 62)


def _traced_pipeline(tmp_path):
    import halide_tpu as hl
    from halide_tpu.trace import tracing
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.Float(32), 2, "tv_in")
    inp.set(np.ones((12, 16), np.float32))
    prod = hl.Func("tv_prod")
    cons = hl.Func("tv_cons")
    prod[x, y] = inp[x, y] * 2.0
    prod.compute_root().trace_stores().trace_realizations()
    cons[x, y] = prod[x, y] + 1.0
    pipe = hl.Pipeline(cons)
    path = str(tmp_path / "trace.bin")
    with tracing(pipe, file=path) as t:
        np.asarray(pipe.realize([16, 12]).to_numpy())
    return path, t


def test_traceviz_dump_and_html(tmp_path, capsys):
    # reference: util/HalideTraceViz.cpp / HalideTraceDump.cpp
    from halide_tpu.tools import traceviz
    path, t = _traced_pipeline(tmp_path)

    packets = traceviz.read_packets(path)
    assert any(p.event == 1 and p.name == "tv_prod" for p in packets)
    stores = [p for p in packets if p.event == 1]
    arr = traceviz.decode_store(stores[0])
    assert arr is not None and arr.shape == (12, 16)
    np.testing.assert_allclose(arr[0, 0], 2.0)

    rc = traceviz.main([path, "--dump"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tv_prod" in out and "total packets" in out

    html_path = str(tmp_path / "t.html")
    rc = traceviz.main([path, "-o", html_path])
    assert rc == 0
    html = open(html_path).read()
    assert "tv_prod" in html and "data:image/png;base64," in html


def test_gen_emit_pysource(tmp_path):
    # the CodeGen_C analog: -e pysource writes a standalone runnable .py
    # (graph round-trip + lowered jaxpr appendix) that reproduces the
    # pipeline's output
    import subprocess
    import numpy as np
    from halide_tpu import generator as G

    gen = G.create("blur")
    written = G.emit_artifacts(gen, str(tmp_path), "blur_fn",
                               ["pysource"], sizes=None)
    assert "pysource" in written, written
    src_path = written["pysource"]
    ns = {}
    exec(open(src_path).read(), ns)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 14, (34, 66), np.uint16)
    out = ns["run"]([64, 32], input=img).to_numpy()
    a = img.astype(np.uint16)
    bx = (a[:, :-2] + a[:, 1:-1] + a[:, 2:]) // 3
    ref = (bx[:-2] + bx[1:-1] + bx[2:]) // 3
    np.testing.assert_array_equal(np.asarray(out), ref)
