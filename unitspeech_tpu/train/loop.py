"""Epoch-level training loops for STEP1 and STEP2.

TPU-native equivalents of the reference's hydra mains
(/root/reference/train_STEP1.py:45-304, train_STEP2.py:37-236):

  * the mel frontend runs ON DEVICE inside a jitted prepare step (the
    reference STFTs on CPU dataloader workers, uncached, every epoch)
  * data parallelism over the mesh's `data` axis (batch sharded, params
    replicated; the reference is single-GPU)
  * atomic orbax checkpoints of params+opt_state+step with resume
    (the reference saves params only, train_STEP1.py:278-304)
  * TensorBoard scalars + train.log parity (utils/logging.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


from unitspeech_tpu.config import MainConfig
from unitspeech_tpu.data.dataset import BucketCollator, iterate_batches
from unitspeech_tpu.ops.mel import mel_spectrogram, normalize_mel
from unitspeech_tpu.parallel import make_mesh, replicate_tree, shard_batch
from unitspeech_tpu.train.steps import TrainState
from unitspeech_tpu.utils import checkpoint as ckpt
from unitspeech_tpu.utils.logging import MetricsWriter, StepTimer, get_logger

logger = get_logger()


@partial(
    jax.jit,
    static_argnames=("n_fft", "num_mels", "sampling_rate", "hop", "win", "fmin", "fmax"),
)
def _wav_to_normalized_mel(
    wav, mel_min, mel_max, n_fft: int, num_mels: int, sampling_rate: int,
    hop: int, win: int, fmin: float, fmax: float,
):
    mel = mel_spectrogram(
        wav, n_fft=n_fft, num_mels=num_mels, sampling_rate=sampling_rate,
        hop_size=hop, win_size=win, fmin=fmin, fmax=fmax,
    )
    return normalize_mel(mel, mel_min, mel_max)


@dataclass
class TrainLoop:
    """Generic epoch loop shared by STEP1 and STEP2."""

    cfg: MainConfig
    train_step: Callable  # (state, batch, key) -> (state, metrics)
    state: TrainState
    dataset: Any
    collator: BucketCollator
    mel_min: Any  # (n_feats,)
    mel_max: Any
    spk_embs: Optional[Dict[int, np.ndarray]] = None  # id -> (S,)
    log_dir: str = "logs/unitspeech_tpu"
    checkpoint_dir: str = "checkpoints/train"
    save_every: int = 5
    seed: int = 42
    extra_step_args: tuple = ()

    def __post_init__(self):
        import jax as _jax

        # per-host dataset sharding (SURVEY §2.5): each host feeds its local
        # devices its strided slice of the epoch; the global batch is
        # process_count x the per-host batch
        self.process_index = _jax.process_index()
        self.process_count = _jax.process_count()
        # DP width = the largest divisor of batch_size that fits the local
        # device count (batch shards must divide evenly)
        n_dev = len(_jax.local_devices())
        bs = self.cfg.train.batch_size
        width = max(d for d in range(1, min(n_dev, bs) + 1) if bs % d == 0)
        self.mesh = make_mesh(devices=_jax.devices()[:width])
        self.writer = MetricsWriter(self.log_dir)
        self.timer = StepTimer()
        self.state = TrainState(
            replicate_tree(self.state.params, self.mesh),
            replicate_tree(self.state.opt_state, self.mesh),
            self.state.step,
        )

    def _prepare_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Host batch -> device batch: shard, mel-ify, attach speaker embs."""
        d = self.cfg.data
        out = dict(batch)
        wav = out.pop("wav")
        spk_ids = out.pop("spk_id")
        if self.spk_embs is not None:
            out["spk_emb"] = np.stack(
                [self.spk_embs[int(i)] for i in spk_ids]
            ).astype(np.float32)
        out = shard_batch(out, self.mesh)
        wav = shard_batch(wav, self.mesh)
        out["mel"] = _wav_to_normalized_mel(
            wav, self.mel_min, self.mel_max,
            n_fft=d.n_fft, num_mels=d.n_feats, sampling_rate=d.sampling_rate,
            hop=d.hop_length, win=d.win_length, fmin=d.mel_fmin, fmax=d.mel_fmax,
        )
        return out

    def resume(self) -> int:
        latest = ckpt.latest_checkpoint(self.checkpoint_dir)
        if latest is None:
            return 0
        restored = ckpt.load_checkpoint(
            latest,
            target={
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": np.asarray(self.state.step),
            },
        )
        self.state = TrainState(
            replicate_tree(restored["params"], self.mesh),
            replicate_tree(restored["opt_state"], self.mesh),
            jnp.asarray(restored["step"]),
        )
        epoch = ckpt.checkpoint_step(latest)
        logger.info("resumed from %s (epoch %d)", latest, epoch)
        return epoch

    def _save(self, tag: int):
        ckpt.save_checkpoint(
            self.checkpoint_dir,
            tag,
            {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": np.asarray(self.state.step),
            },
            keep=self.cfg.train.keep_checkpoints,
        )

    def run(self, n_epochs: int, start_epoch: int = 0):
        import signal

        # preemption safety (TPU pods are preemptible; the reference loses
        # the epoch on any crash, SURVEY.md §5): SIGTERM requests a
        # checkpoint at the next step boundary, then exits cleanly
        preempted = {"flag": False}

        def _on_term(signum, frame):
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # non-main thread
            prev_handler = None

        rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed)
        it = int(self.state.step)
        for epoch in range(start_epoch, n_epochs):
            sums: Dict[str, float] = {}
            count = 0
            for batch in iterate_batches(
                self.dataset, self.collator, self.cfg.train.batch_size,
                key=rng, shuffle=self.cfg.train.shuffle,
                drop_last=self.cfg.train.drop_last,
                process_index=self.process_index,
                process_count=self.process_count,
            ):
                batch = self._prepare_batch(batch)
                key, sub = jax.random.split(key)
                self.state, metrics = self.train_step(
                    self.state, *self.extra_step_args, batch, sub
                )
                it += 1
                host = {k: float(v) for k, v in metrics.items()}
                self.writer.scalars(host, it)
                ema = self.timer.tick()
                if ema is not None:
                    self.writer.scalars({"sec_per_step": ema}, it, prefix="perf")
                for k, v in host.items():
                    sums[k] = sums.get(k, 0.0) + v
                count += 1
                if preempted["flag"]:
                    logger.info("SIGTERM: checkpointing at epoch %d and exiting", epoch)
                    self._save(epoch + 1)
                    if prev_handler is not None:
                        signal.signal(signal.SIGTERM, prev_handler)
                    return self.state
            if count:
                self.writer.epoch_summary(
                    epoch, {k: v / count for k, v in sums.items()}
                )
            if (epoch + 1) % self.save_every == 0:
                self._save(epoch + 1)
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        return self.state
