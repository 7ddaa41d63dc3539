"""Asynchronous checkpointing (reference has none; SURVEY.md §5 rebuild note).

``AsyncCheckpointer`` fetches the train state to host memory synchronously
(cheap) and performs serialisation + disk write on a background thread, so
training never blocks on IO.  The file contract is identical to
:mod:`nsdp_tpu.training.checkpoints`.
"""

import threading
from typing import Optional

import jax

from nsdp_tpu.training import checkpoints as ckpt


class AsyncCheckpointer:
    """Background-thread writer for the model/opt checkpoint pair."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def wait(self) -> None:
        """Block until the in-flight save (if any) finishes; re-raise errors."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, epoch: int, state, experiment_directory: str) -> None:
        """Snapshot to host and write in the background."""
        self.wait()  # at most one in-flight save
        host_state = jax.tree.map(lambda x: jax.device_get(x), state)

        def work():
            try:
                ckpt.save_checkpoints(epoch, host_state, experiment_directory)
            except BaseException as e:  # surfaced on next wait()/save()
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def save_best(
        self, epoch: int, state, experiment_directory: str, val_loss: float
    ) -> None:
        self.wait()
        host_state = jax.tree.map(lambda x: jax.device_get(x), state)

        def work():
            try:
                ckpt.save_best_checkpoints(
                    epoch, host_state, experiment_directory, val_loss
                )
            except BaseException as e:
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()
