"""OpenAI-compatible HTTP serving frontend, end-to-end over localhost
(llm/engine.py, llm/server_http.py, cli/serve_http.py).

The reference has no serving/API layer (its inference surface is batch eval
loops, /root/reference/src/evaluation.py:24); these tests pin the rebuild's
frontend to the paged-generation reference path: every token that leaves the
HTTP API must match ``paged_generate`` greedy decoding exactly.
"""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.engine import ServingEngine
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.paged import paged_generate
from ssp_x_vit_tpu.llm.server_http import create_server

CFG = LlamaConfig(vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)
PARAMS = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
PAGE = 16


def _greedy_ref(prompt, n):
    out = paged_generate(PARAMS, CFG, [np.asarray(prompt, np.int32)],
                         max_new_tokens=n, page_size=PAGE,
                         cache_dtype=jnp.float32)[0]
    return [int(t) for t in out[len(prompt):]]


@pytest.fixture(scope="module")
def served():
    engine = ServingEngine(PARAMS, CFG, max_batch=3, num_pages=64,
                           page_size=PAGE, max_context=256,
                           cache_dtype=jnp.float32)
    srv = create_server(engine, tokenizer=None, port=0,
                        model_name="tiny-test")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], engine
    srv.shutdown()
    engine.shutdown()


def _post(port, path, body, stream=False):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    raw = resp.read()
    conn.close()
    if stream:
        events = []
        for block in raw.decode().split("\n\n"):
            if block.startswith("data: ") and block != "data: [DONE]":
                events.append(json.loads(block[len("data: "):]))
        return resp.status, events
    return resp.status, json.loads(raw)


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    out = resp.status, json.loads(resp.read())
    conn.close()
    return out


def test_health_and_models(served):
    port, _ = served
    assert _get(port, "/health") == (200, {"status": "ok"})
    status, models = _get(port, "/v1/models")
    assert status == 200
    assert models["data"][0]["id"] == "tiny-test"


def test_completion_ids_greedy_matches_paged_generate(served):
    port, _ = served
    prompt = [3, 5, 7, 11]
    status, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "temperature": 0})
    assert status == 200
    assert out["object"] == "text_completion"
    assert out["choices"][0]["finish_reason"] == "length"
    assert out["choices"][0]["token_ids"] == _greedy_ref(prompt, 8)
    assert out["usage"] == {"prompt_tokens": 4, "completion_tokens": 8,
                            "total_tokens": 12}


def test_streaming_matches_nonstream(served):
    port, _ = served
    prompt = [2, 4, 6]
    _, events = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 6, "temperature": 0,
        "stream": True}, stream=True)
    toks = [e["choices"][0]["token_ids"][0] for e in events
            if e["choices"][0]["finish_reason"] is None]
    assert toks == _greedy_ref(prompt, 6)
    assert events[-1]["choices"][0]["finish_reason"] == "length"


def test_concurrent_mixed_sampling(served):
    """A greedy and a sampled request decode together in one batch; the
    greedy one stays exact (per-request sampling never leaks across slots)."""
    port, _ = served
    results = {}

    def run(name, body):
        results[name] = _post(port, "/v1/completions", body)

    threads = [
        threading.Thread(target=run, args=("greedy", {
            "prompt": [9, 10, 11], "max_tokens": 10, "temperature": 0})),
        threading.Thread(target=run, args=("sampled", {
            "prompt": [20, 21], "max_tokens": 10, "temperature": 0.9,
            "top_p": 0.9, "seed": 7})),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    status_g, out_g = results["greedy"]
    status_s, out_s = results["sampled"]
    assert status_g == 200 and status_s == 200
    assert out_g["choices"][0]["token_ids"] == _greedy_ref([9, 10, 11], 10)
    assert len(out_s["choices"][0]["token_ids"]) == 10
    assert all(0 <= t < CFG.vocab_size
               for t in out_s["choices"][0]["token_ids"])


def test_stop_token_ids_and_eos(served):
    port, _ = served
    prompt = [3, 5, 7, 11]
    ref = _greedy_ref(prompt, 8)
    stop_tok = ref[2]
    status, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "temperature": 0,
        "stop_token_ids": [stop_tok]})
    assert status == 200
    choice = out["choices"][0]
    assert choice["finish_reason"] == "stop"
    assert choice["token_ids"] == ref[:2]  # stop token stripped

    # eos behaves identically through the eos_token_id request field
    status, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "temperature": 0,
        "eos_token_id": stop_tok})
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["choices"][0]["token_ids"] == ref[:2]


def test_request_errors(served):
    port, _ = served
    status, out = _post(port, "/v1/completions", {
        "prompt": "text needs a tokenizer", "max_tokens": 4})
    assert status == 400 and "tokenizer" in out["error"]["message"]
    status, out = _post(port, "/v1/completions", {
        "prompt": [1, 2], "max_tokens": 0})
    assert status == 400
    status, out = _post(port, "/v1/completions", {"prompt": []})
    assert status == 400
    # over-long request is rejected with an error, not queued forever
    status, out = _post(port, "/v1/completions", {
        "prompt": [1] * 100, "max_tokens": 250})
    assert status == 400 and "max" in out["error"]["message"].lower()


def test_queue_backpressure_more_requests_than_slots(served):
    """5 concurrent requests over 3 slots: continuous batching must drain
    the queue, every response exact."""
    port, _ = served
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
    results = [None] * 5

    def run(i):
        results[i] = _post(port, "/v1/completions", {
            "prompt": prompts[i], "max_tokens": 5, "temperature": 0})

    threads = [threading.Thread(target=run, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i in range(5):
        status, out = results[i]
        assert status == 200
        assert out["choices"][0]["token_ids"] == _greedy_ref(prompts[i], 5)


# ---------------------------------------------------------------------------
# text mode: a real (tiny, offline-trained) tokenizer end to end
# ---------------------------------------------------------------------------

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def text_served(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    from ssp_x_vit_tpu.llm.tokenizer import ByteLevelBPETokenizer

    corpus = ["the quick brown fox jumps over the lazy dog",
              "pack my box with five dozen liquor jugs"] * 8
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(corpus, trainer)
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tok.save(path)
    tokenizer = ByteLevelBPETokenizer.from_file(path)

    engine = ServingEngine(PARAMS, CFG, max_batch=2, num_pages=64,
                           page_size=PAGE, max_context=256,
                           cache_dtype=jnp.float32)
    srv = create_server(engine, tokenizer=tokenizer, port=0,
                        model_name="tiny-text")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], tokenizer
    srv.shutdown()
    engine.shutdown()


def test_text_completion_roundtrip(text_served):
    port, tokenizer = text_served
    prompt = "the quick brown"
    ids = tokenizer.encode(prompt)
    ref = _greedy_ref(ids, 6)
    status, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 6, "temperature": 0})
    assert status == 200
    assert out["choices"][0]["text"] == tokenizer.decode(ref)
    assert out["usage"]["prompt_tokens"] == len(ids)


def test_text_stream_concatenates_to_nonstream(text_served):
    port, tokenizer = text_served
    prompt = "pack my box"
    _, once = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 6, "temperature": 0})
    _, events = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 6, "temperature": 0,
        "stream": True}, stream=True)
    text = "".join(e["choices"][0]["text"] for e in events
                   if e["choices"][0]["finish_reason"] is None)
    assert text == once["choices"][0]["text"]


def test_stop_string_truncates_and_cancels(text_served):
    import re

    port, tokenizer = text_served
    # random weights can emit byte sequences that decode to replacement
    # chars; deterministically pick a prompt whose greedy continuation
    # contains 2 printable chars to use as the stop string (weights and
    # tokenizer are both seeded, so this search is stable)
    for prompt in ["the quick brown", "pack my box", "jumps over the",
                   "lazy dog", "five dozen", "the", "quick", "box with"]:
        ids = tokenizer.encode(prompt)
        full = tokenizer.decode(_greedy_ref(ids, 8))
        m = re.search(r"[ -~]{2}", full)
        if m and full.find(m.group(0)) > 0:
            stop = m.group(0)
            break
    else:
        pytest.skip("no printable greedy generation among probe prompts")
    status, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "temperature": 0, "stop": stop})
    assert status == 200
    choice = out["choices"][0]
    assert choice["finish_reason"] == "stop"
    assert choice["text"] == full[:full.find(stop)]
    assert stop not in choice["text"]


def test_chat_completion(text_served):
    port, tokenizer = text_served
    from ssp_x_vit_tpu.llm.server_http import _render_chat

    messages = [{"role": "system", "content": "be brief"},
                {"role": "user", "content": "the quick"}]
    rendered = _render_chat(messages)
    ref = _greedy_ref(tokenizer.encode(rendered), 5)
    status, out = _post(port, "/v1/chat/completions", {
        "messages": messages, "max_tokens": 5, "temperature": 0})
    assert status == 200
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert msg["content"] == tokenizer.decode(ref)


def test_cli_argparser_smoke():
    from ssp_x_vit_tpu.cli.serve_http import build_argparser

    args = build_argparser().parse_args(
        ["--model", "tiny-random", "--port", "0", "--kv-dtype", "int8"])
    assert args.kv_dtype == "int8" and args.model == "tiny-random"
