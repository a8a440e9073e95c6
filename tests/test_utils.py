"""Observability tests: meters, metric logger, file logger, hub."""

import logging
import os

import numpy as np

from vit_search_tpu.utils import MetricLogger, NoOpLogger, SmoothedValue, file_logger


def test_smoothed_value_window_and_global():
    v = SmoothedValue(window_size=3)
    for x in (1, 2, 3, 4):
        v.update(x)
    assert v.window.maxlen == 3
    assert v.avg == 3.0          # window holds 2,3,4
    assert v.median == 3.0
    assert v.global_avg == 2.5   # all four
    assert v.max == 4.0 and v.value == 4.0
    v.update(10, n=6)
    assert v.global_avg == (1 + 2 + 3 + 4 + 60) / 10


def test_smoothed_value_sync():
    v = SmoothedValue()
    v.update(2.0, n=2)
    v.sync(all_reduce=lambda arr: arr * 4)  # pretend 4 processes
    assert v.count == 8 and v.total == 16.0
    assert v.global_avg == 2.0


def test_metric_logger_log_every_and_averages(capsys):
    logger = MetricLogger()
    for batch in logger.log_every(range(5), print_freq=2, header="T:"):
        logger.update(loss=float(batch))
    out = capsys.readouterr().out
    assert "T: [0/5]" in out and "eta:" in out and "Total time" in out
    assert logger.averages()["loss"] == 2.0
    assert "loss" in str(logger)


def test_file_logger_writes_three_files(tmp_path):
    log = file_logger(str(tmp_path), is_master=True)
    log.info("info line")
    log.warning("warn line")
    log.debug("debug line")
    for handler in logging.getLogger().handlers:
        handler.flush()
    verbose = (tmp_path / "verbose.log").read_text()
    event = (tmp_path / "event.log").read_text()
    debug = (tmp_path / "debug.log").read_text()
    assert "info line" in verbose and "warn line" in verbose
    assert "warn line" in event and "info line" not in event
    assert "debug line" in debug and "test_utils.py" in debug


def test_noop_logger_for_other_ranks():
    log = file_logger("/tmp/nope", is_master=False, is_rank0=False)
    assert isinstance(log, NoOpLogger)
    log.info("swallowed")  # no-op, no error


def test_hub_load_and_list():
    from vit_search_tpu import hub

    assert "deit_tiny_patch16_224" in hub.list_models()
    model, variables = hub.load("deit_tiny_patch16_224", img_size=32,
                                num_classes=4, depth=1)
    assert "params" in variables
    import jax.numpy as jnp

    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 4)


def test_hub_url_and_torch_checkpoint_loading(tmp_path, monkeypatch):
    """hub.load accepts an http:// URL to a reference-format .pth torch
    checkpoint: downloaded into the cache once, converted on the fly
    (reference hubconf.py / models.py:15-57 pretrained loading)."""
    import http.server
    import threading

    import jax
    import numpy as np
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    from test_convert_torch import LINEAR_NET, _synth_torch_sd

    from vit_search_tpu import hub

    name = "flexible_vit_sr_patch14_224"
    model, variables = hub.load(name, img_size=28, network_def=LINEAR_NET,
                                num_classes=4)
    sd = _synth_torch_sd(variables["params"], {}, LINEAR_NET, patch=14)
    serve_dir = tmp_path / "www"
    serve_dir.mkdir()
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}},
               serve_dir / "ckpt.pth")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve_dir), **kw)
    httpd = http.server.HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}/ckpt.pth"

    monkeypatch.setenv("VST_HUB_CACHE", str(tmp_path / "cache"))
    try:
        _, loaded = hub.load(name, checkpoint=url, img_size=28,
                             network_def=LINEAR_NET, num_classes=4)
    finally:
        httpd.shutdown()

    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(loaded["params"])[0],
            jax.tree_util.tree_flatten_with_path(variables["params"])[0]):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # cache hit: server is down, same URL still resolves
    _, again = hub.load(name, checkpoint=url, img_size=28,
                        network_def=LINEAR_NET, num_classes=4)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(again["params"])[0]),
        np.asarray(jax.tree.leaves(loaded["params"])[0]))

    # pretrained registry: published deit names present, unknown names error
    for deit in ("deit_tiny_patch16_224", "deit_small_patch16_224",
                 "deit_base_patch16_224"):
        assert deit in hub.PRETRAINED_URLS
    with _pytest.raises(ValueError):
        hub.load("flexible_vit_sr_patch14_224", pretrained=True,
                 img_size=28, network_def=LINEAR_NET, num_classes=4)
