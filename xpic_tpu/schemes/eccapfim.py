"""eccapfim scheme — implemented in a later milestone this round."""


class EccapfimSimulation:
    def __init__(self, cfg):
        raise NotImplementedError("eccapfim scheme: in progress")
