"""End-to-end learnability: a tiny Whisper must memorize a tiny corpus.

This is the round-trip proof the whole stack (mel front end, encoder,
decoder, loss, optimizer, eval path) actually learns — loss collapses and
teacher-forced WER drops to ~0 on the training set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.data.runtime import AmiVideoDataset, WhisperVideoCollator
from avsl_tpu.data.tokenizer import ByteTokenizer
from avsl_tpu.models import Whisper
from avsl_tpu.train.loop import TrainState, make_train_step
from avsl_tpu.train.objectives import flamingo_loss_fn
from avsl_tpu.train.runner import evaluate_wer


@pytest.mark.slow
def test_tiny_whisper_memorizes_synthetic_corpus():
    rng = np.random.default_rng(0)
    texts = ["hello world", "open the door", "red cat", "we are done"]
    rows = []
    for i, text in enumerate(texts):
        # distinct tones per utterance so the encoder can discriminate
        t = np.arange(8000) / 16000.0
        freq = 200.0 + 150.0 * i
        audio = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        rows.append(
            {"audio": {"array": audio, "sampling_rate": 16000}, "transcript": text,
             "duration": 0.5}
        )

    tok = ByteTokenizer()
    ds = AmiVideoDataset(rows, tok, audio_max_length=8000, load_video=False)
    collator = WhisperVideoCollator(eot_id=tok.eot)
    batch = collator([ds[i] for i in range(len(rows))])

    cfg = WhisperConfig.tiny_test(dtype="float32", n_vocab=tok.vocab_size)
    model = Whisper(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["dec_input_ids"]
    )
    tx = optax.adamw(optax.linear_schedule(3e-3, 1e-3, 150), weight_decay=0.0)
    # train without dropout so the tiny model can overfit deterministically
    loss_fn = flamingo_loss_fn(model, train=False)
    step = make_train_step(loss_fn, tx, donate=False)
    state = TrainState.create(variables["params"], tx)

    losses = []
    for _ in range(150):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.15 * losses[0], (losses[0], losses[-1])

    @jax.jit
    def eval_logits(state, batch):
        return model.apply(
            {"params": state.params}, batch["input_ids"], batch["dec_input_ids"],
            deterministic=True,
        )

    final = evaluate_wer(
        lambda b: eval_logits(state, b), [batch], tok, prefix="train"
    )
    assert final["train/wer_av"] < 0.15, final
