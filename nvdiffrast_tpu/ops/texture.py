"""placeholder, replaced below"""
class TextureMipWrapper: pass
def texture(*a, **k): raise NotImplementedError
def texture_construct_mip(*a, **k): raise NotImplementedError
