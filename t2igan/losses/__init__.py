from t2igan.losses.damsm import (attention_match_scores, kl_loss, sent_loss,
                                 strip_special_tokens, words_loss)
from t2igan.losses.gan import (bce_with_logits, discriminator_loss,
                               generator_adv_loss, wrong_pair)
from t2igan.losses.ntxent import nt_xent_loss

__all__ = [
    "sent_loss", "words_loss", "attention_match_scores", "kl_loss",
    "strip_special_tokens", "discriminator_loss", "generator_adv_loss",
    "bce_with_logits", "wrong_pair", "nt_xent_loss",
]
