"""Byzantine attacks: data poisoning + model (update) poisoning.

Registry names match the reference factory
(reference: src/attacks/__init__.py:31-59): none, label_flip, all_to_one,
backdoor, distributed_backdoor, model_replacement, adaptive_krum, scaling,
ipm — plus the cross-modal attacks whose API is specified only by the
reference's tests (reference: tests/test_asr_crossmodal.py:219-340):
attribute_poisoning, dual_modal_trigger.

Two injection surfaces, mirroring the reference's dual interface
(reference: src/attacks/base_attack.py:33-76):

- **data poisoning** — ``poison_dataset`` transforms a client shard once at
  setup (exact-count, seeded, reproducing the reference's np.random.choice
  semantics); trigger patching itself is a pure array op reused on device
  for the ASR eval set;
- **model poisoning** — ``poison_updates`` transforms the stacked [C, D]
  update matrix *inside the jitted round program*, gated by a malicious-client
  mask. The reference only wired this in its Flower path and silently skipped
  it in simulation (SURVEY.md §2.9-2); here it always fires.
"""

from multimodal_fl_security_tpu.attacks.base import (  # noqa: F401
    ATTACKS,
    BaseAttack,
    NoAttack,
    get_attack,
)
from multimodal_fl_security_tpu.attacks import label_flip  # noqa: F401
from multimodal_fl_security_tpu.attacks import backdoor  # noqa: F401
from multimodal_fl_security_tpu.attacks import model_poisoning  # noqa: F401
from multimodal_fl_security_tpu.attacks import cross_modal  # noqa: F401
# Beyond-reference: AGR-agnostic attacks (Shejwalkar & Houmansadr NDSS'21)
# and ALIE (Baruch et al. NeurIPS'19).
from multimodal_fl_security_tpu.attacks import agr_agnostic  # noqa: F401
from multimodal_fl_security_tpu.attacks import alie  # noqa: F401
