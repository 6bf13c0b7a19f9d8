"""Conversation templates for graph-LLM chat (reference:
gammagl/utils/conversation.py, 419 LoC -- simplified to the separator-style
templates GraphGPT/LLaGA use)."""

import dataclasses
from typing import List, Tuple

__all__ = ["Conversation", "conv_templates", "get_conv_template"]


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[str]]
    sep: str = "###"
    sep2: str = None

    def append_message(self, role, message):
        self.messages.append([role, message])

    def get_prompt(self):
        parts = [self.system + self.sep]
        for i, (role, msg) in enumerate(self.messages):
            if msg is None:
                parts.append(f"{role}:")
            else:
                sep = self.sep if self.sep2 is None or i % 2 == 0 \
                    else self.sep2
                parts.append(f"{role}: {msg}{sep}")
        return "\n".join(parts)

    def copy(self):
        return Conversation(self.system, self.roles,
                            [list(m) for m in self.messages], self.sep,
                            self.sep2)


conv_templates = {
    "graphchat_v1": Conversation(
        system=("You are GraphGPT. You are able to understand the graph "
                "structures the user provides."),
        roles=("Human", "Assistant"),
        messages=[],
        sep="###",
    ),
    "llaga_llama_2": Conversation(
        system=("You are a helpful assistant that understands graph "
                "structure encoded as node sequences."),
        roles=("USER", "ASSISTANT"),
        messages=[],
        sep=" ",
        sep2="</s>",
    ),
}


def get_conv_template(name):
    return conv_templates[name].copy()
