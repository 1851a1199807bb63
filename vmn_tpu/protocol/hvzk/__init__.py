"""Zero-knowledge proof layer (reference: com.verificatum.protocol.hvzk).

- `pos_tw`: Terelius–Wikström proof of shuffle (reference PoSBasicTW)
- `posc_tw`: proof of shuffle of commitments — offline phase (PoSCBasicTW)
- `ccpos_w`: commitment-consistent proof of shuffle — online phase
  (CCPoSBasicW)
- `challenger`: random-oracle (Fiat–Shamir) and interactive challengers
"""
