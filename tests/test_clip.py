"""CLIP text encoder parity vs HF transformers (random tiny config — no
network needed) and get_word_inds behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uspace_tpu.codecs.clip_text import (
    CLIPTextEncoder,
    clip_torch_to_flax,
    get_word_inds,
)

TINY = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_length=16)


class TestCLIPText:
    def test_shapes(self, rng):
        m = CLIPTextEncoder(**TINY)
        ids = jnp.zeros((2, 16), jnp.int32)
        params = m.init(rng, ids)
        out = m.apply(params, ids)
        assert out.shape == (2, 16, 32)

    def test_causality(self, rng):
        """Changing a later token must not affect earlier positions."""
        m = CLIPTextEncoder(**TINY)
        ids1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8] + [0] * 8])
        ids2 = ids1.at[0, 7].set(42)
        params = m.init(rng, ids1)
        o1 = m.apply(params, ids1)
        o2 = m.apply(params, ids2)
        np.testing.assert_allclose(o1[0, :7], o2[0, :7], atol=1e-5)
        assert float(jnp.abs(o1[0, 7:] - o2[0, 7:]).max()) > 1e-4

    def test_parity_vs_hf(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        cfg = transformers.CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16,
        )
        torch.manual_seed(0)
        hf = transformers.CLIPTextModel(cfg).eval()
        ids = np.array([[49, 3, 7, 11, 2, 0, 0, 0],
                        [5, 6, 7, 8, 9, 10, 11, 12]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
        m = CLIPTextEncoder(**TINY)
        params = {"params": clip_torch_to_flax(hf.state_dict())}
        out = m.apply(params, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class TestWordInds:
    class _FakeTok:
        """bos + one token per character + eos."""

        def encode(self, text):
            return [0] + [ord(c) for c in text.replace(" ", "")] + [1]

        def decode(self, items):
            return "".join(chr(i) for i in items)

    def test_word_positions(self):
        tok = self._FakeTok()
        inds = get_word_inds("ab cd", "cd", tok)
        # tokens: [bos, a, b, c, d, eos]; 'cd' -> positions 3, 4
        assert list(inds) == [3, 4]

    def test_by_index(self):
        tok = self._FakeTok()
        inds = get_word_inds("ab cd", 0, tok)
        assert list(inds) == [1, 2]
