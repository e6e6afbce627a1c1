// chesscore: self-contained chess rules + search engine with a C API.
//
// TPU-native LMRL-Gym's chess oracle. The reference depends on two
// externals for its chess environments (SURVEY §2.10-2.11): the
// python-chess library (movegen/SAN/FEN, llm_rl_scripts/chess/env/env.py)
// and a vendored Stockfish binary as the opponent (UCI_Elo 1200,
// 100ms/move, chess/env/env.py:54-56). Neither is available here; this
// single translation unit provides both roles:
//
//   * full rules: FEN parse/format, legal move generation (castling, en
//     passant, promotion), SAN formatting with disambiguation and +/#
//     suffixes, SAN parsing, check/mate/stalemate/draw detection,
//     Zobrist hashing (host-side repetition tracking);
//   * opponent: iterative-deepening alpha-beta with quiescence search,
//     material + piece-square eval, node budget, and an Elo-style
//     strength limiter (eval noise + depth cap, seeded) standing in for
//     Stockfish's UCI_Elo handicap;
//   * batched entry points so a vectorized env can resolve many boards
//     per call through one ctypes crossing.
//
// Board representation: 10x12 mailbox (simple, compact, correct).
// Build: g++ -O2 -std=c++17 -shared -fPIC chesscore.cpp -o libchesscore.so
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cctype>
#include <cstdlib>
#include <string>
#include <vector>
#include <algorithm>

namespace {

// ---------- board basics ----------

enum Piece : int8_t {
  EMPTY = 0,
  WP, WN, WB, WR, WQ, WK,
  BP, BN, BB, BR, BQ, BK,
  OFFBOARD = -1,
};

inline bool is_white(int8_t p) { return p >= WP && p <= WK; }
inline bool is_black(int8_t p) { return p >= BP && p <= BK; }
inline int color_of(int8_t p) { return is_white(p) ? 0 : 1; }
inline int type_of(int8_t p) { return is_white(p) ? p : p - 6; }  // 1..6 = PNBRQK

constexpr int NORTH = 10, SOUTH = -10, EAST = 1, WEST = -1;

inline int sq120(int file, int rank) { return 21 + file + 10 * rank; }  // rank 0 = '1'
inline int file_of120(int s) { return (s - 21) % 10; }
inline int rank_of120(int s) { return (s - 21) / 10; }
inline bool on_board(int s) {
  int f = (s % 10), r = (s / 10);
  return f >= 1 && f <= 8 && r >= 2 && r <= 9;
}

struct Position {
  int8_t board[120];
  int side;          // 0 white, 1 black
  int castling;      // bits: 1 K, 2 Q, 4 k, 8 q
  int ep;            // en-passant target square (120) or -1
  int halfmove;
  int fullmove;

  void clear() {
    for (int i = 0; i < 120; i++) board[i] = OFFBOARD;
    for (int r = 0; r < 8; r++)
      for (int f = 0; f < 8; f++) board[sq120(f, r)] = EMPTY;
    side = 0; castling = 0; ep = -1; halfmove = 0; fullmove = 1;
  }
};

struct Move {
  int from, to;
  int8_t promo;     // piece type 0 or N/B/R/Q (2..5)
  bool is_ep;
  bool is_castle;
};

// ---------- FEN ----------

const char* PIECE_CHARS = ".PNBRQKpnbrqk";

bool parse_fen(const char* fen, Position& pos) {
  pos.clear();
  int file = 0, rank = 7;
  const char* p = fen;
  while (*p && *p != ' ') {
    char c = *p++;
    if (c == '/') { rank--; file = 0; continue; }
    if (c >= '1' && c <= '8') { file += c - '0'; continue; }
    const char* idx = strchr(PIECE_CHARS, c);
    if (!idx || file > 7 || rank < 0) return false;
    pos.board[sq120(file, rank)] = (int8_t)(idx - PIECE_CHARS);
    file++;
  }
  if (*p != ' ') return false;
  p++;
  if (*p == 'w') pos.side = 0;
  else if (*p == 'b') pos.side = 1;
  else return false;
  p++;
  if (*p != ' ') return false;
  p++;
  pos.castling = 0;
  if (*p == '-') { p++; }
  else {
    while (*p && *p != ' ') {
      switch (*p) {
        case 'K': pos.castling |= 1; break;
        case 'Q': pos.castling |= 2; break;
        case 'k': pos.castling |= 4; break;
        case 'q': pos.castling |= 8; break;
        default: return false;
      }
      p++;
    }
  }
  if (*p != ' ') return false;
  p++;
  if (*p == '-') { pos.ep = -1; p++; }
  else {
    if (p[0] < 'a' || p[0] > 'h' || p[1] < '1' || p[1] > '8') return false;
    pos.ep = sq120(p[0] - 'a', p[1] - '1');
    p += 2;
  }
  pos.halfmove = 0; pos.fullmove = 1;
  if (*p == ' ') {
    p++;
    pos.halfmove = atoi(p);
    while (*p && *p != ' ') p++;
    if (*p == ' ') { p++; pos.fullmove = atoi(p); }
  }
  return true;
}

void format_fen(const Position& pos, char* out) {
  char* o = out;
  for (int rank = 7; rank >= 0; rank--) {
    int empty = 0;
    for (int file = 0; file < 8; file++) {
      int8_t pc = pos.board[sq120(file, rank)];
      if (pc == EMPTY) { empty++; continue; }
      if (empty) *o++ = (char)('0' + empty), empty = 0;
      *o++ = PIECE_CHARS[pc];
    }
    if (empty) *o++ = (char)('0' + empty);
    if (rank) *o++ = '/';
  }
  o += sprintf(o, " %c ", pos.side == 0 ? 'w' : 'b');
  if (!pos.castling) *o++ = '-';
  else {
    if (pos.castling & 1) *o++ = 'K';
    if (pos.castling & 2) *o++ = 'Q';
    if (pos.castling & 4) *o++ = 'k';
    if (pos.castling & 8) *o++ = 'q';
  }
  if (pos.ep >= 0)
    o += sprintf(o, " %c%c", 'a' + file_of120(pos.ep), '1' + rank_of120(pos.ep));
  else
    o += sprintf(o, " -");
  sprintf(o, " %d %d", pos.halfmove, pos.fullmove);
}

// ---------- attack detection ----------

const int KNIGHT_D[8] = {21, 19, 12, 8, -21, -19, -12, -8};
const int KING_D[8] = {10, -10, 1, -1, 11, 9, -11, -9};
const int BISHOP_D[4] = {11, 9, -11, -9};
const int ROOK_D[4] = {10, -10, 1, -1};

bool square_attacked(const Position& pos, int sq, int by_color) {
  // pawns
  if (by_color == 0) {
    int8_t p1 = pos.board[sq - 11], p2 = pos.board[sq - 9];
    if (p1 == WP || p2 == WP) return true;
  } else {
    int8_t p1 = pos.board[sq + 11], p2 = pos.board[sq + 9];
    if (p1 == BP || p2 == BP) return true;
  }
  // knights
  int8_t kn = by_color == 0 ? WN : BN;
  for (int d : KNIGHT_D)
    if (pos.board[sq + d] == kn) return true;
  // king
  int8_t kg = by_color == 0 ? WK : BK;
  for (int d : KING_D)
    if (pos.board[sq + d] == kg) return true;
  // sliders
  int8_t bi = by_color == 0 ? WB : BB, rk = by_color == 0 ? WR : BR,
         qn = by_color == 0 ? WQ : BQ;
  for (int d : BISHOP_D) {
    int t = sq + d;
    while (pos.board[t] != OFFBOARD) {
      int8_t pc = pos.board[t];
      if (pc != EMPTY) { if (pc == bi || pc == qn) return true; break; }
      t += d;
    }
  }
  for (int d : ROOK_D) {
    int t = sq + d;
    while (pos.board[t] != OFFBOARD) {
      int8_t pc = pos.board[t];
      if (pc != EMPTY) { if (pc == rk || pc == qn) return true; break; }
      t += d;
    }
  }
  return false;
}

int king_square(const Position& pos, int color) {
  int8_t k = color == 0 ? WK : BK;
  for (int r = 0; r < 8; r++)
    for (int f = 0; f < 8; f++) {
      int s = sq120(f, r);
      if (pos.board[s] == k) return s;
    }
  return -1;
}

bool in_check(const Position& pos, int color) {
  int ks = king_square(pos, color);
  return ks >= 0 && square_attacked(pos, ks, 1 - color);
}

// ---------- make move ----------

void make_move(Position& pos, const Move& m) {
  int8_t pc = pos.board[m.from];
  int color = pos.side;
  bool capture = pos.board[m.to] != EMPTY || m.is_ep;
  bool pawn = type_of(pc) == 1;

  // clear ep by default
  int new_ep = -1;

  if (m.is_castle) {
    pos.board[m.to] = pc;
    pos.board[m.from] = EMPTY;
    if (m.to == m.from + 2) {  // king side
      pos.board[m.from + 1] = pos.board[m.from + 3];
      pos.board[m.from + 3] = EMPTY;
    } else {  // queen side
      pos.board[m.from - 1] = pos.board[m.from - 4];
      pos.board[m.from - 4] = EMPTY;
    }
  } else {
    if (m.is_ep) {
      int cap_sq = m.to + (color == 0 ? SOUTH : NORTH);
      pos.board[cap_sq] = EMPTY;
    }
    pos.board[m.to] = m.promo ? (int8_t)(m.promo + (color == 0 ? 0 : 6)) : pc;
    pos.board[m.from] = EMPTY;
    if (pawn && (m.to - m.from == 2 * NORTH || m.from - m.to == 2 * NORTH))
      new_ep = (m.from + m.to) / 2;
  }

  // castling rights
  auto touch = [&](int sq) {
    if (sq == sq120(4, 0)) pos.castling &= ~3;
    if (sq == sq120(7, 0)) pos.castling &= ~1;
    if (sq == sq120(0, 0)) pos.castling &= ~2;
    if (sq == sq120(4, 7)) pos.castling &= ~12;
    if (sq == sq120(7, 7)) pos.castling &= ~4;
    if (sq == sq120(0, 7)) pos.castling &= ~8;
  };
  touch(m.from);
  touch(m.to);

  pos.ep = new_ep;
  pos.halfmove = (pawn || capture) ? 0 : pos.halfmove + 1;
  if (color == 1) pos.fullmove++;
  pos.side = 1 - color;
}

// ---------- move generation ----------

void gen_pseudo(const Position& pos, std::vector<Move>& out) {
  int color = pos.side;
  for (int r = 0; r < 8; r++)
    for (int f = 0; f < 8; f++) {
      int s = sq120(f, r);
      int8_t pc = pos.board[s];
      if (pc == EMPTY || color_of(pc) != color) continue;
      int t;
      switch (type_of(pc)) {
        case 1: {  // pawn
          int fwd = color == 0 ? NORTH : SOUTH;
          int start_rank = color == 0 ? 1 : 6;
          int promo_rank = color == 0 ? 7 : 0;
          t = s + fwd;
          if (pos.board[t] == EMPTY) {
            if (rank_of120(t) == promo_rank)
              for (int8_t pr : {(int8_t)5, (int8_t)4, (int8_t)3, (int8_t)2})
                out.push_back({s, t, pr, false, false});
            else {
              out.push_back({s, t, 0, false, false});
              if (rank_of120(s) == start_rank && pos.board[t + fwd] == EMPTY)
                out.push_back({s, t + fwd, 0, false, false});
            }
          }
          for (int dc : {EAST, WEST}) {
            t = s + fwd + dc;
            int8_t cap = pos.board[t];
            if (cap != OFFBOARD && cap != EMPTY && color_of(cap) != color) {
              if (rank_of120(t) == promo_rank)
                for (int8_t pr : {(int8_t)5, (int8_t)4, (int8_t)3, (int8_t)2})
                  out.push_back({s, t, pr, false, false});
              else
                out.push_back({s, t, 0, false, false});
            }
            if (t == pos.ep && pos.ep >= 0)
              out.push_back({s, t, 0, true, false});
          }
          break;
        }
        case 2:  // knight
          for (int d : KNIGHT_D) {
            t = s + d;
            int8_t cap = pos.board[t];
            if (cap == OFFBOARD) continue;
            if (cap == EMPTY || color_of(cap) != color)
              out.push_back({s, t, 0, false, false});
          }
          break;
        case 6:  // king
          for (int d : KING_D) {
            t = s + d;
            int8_t cap = pos.board[t];
            if (cap == OFFBOARD) continue;
            if (cap == EMPTY || color_of(cap) != color)
              out.push_back({s, t, 0, false, false});
          }
          // castling
          if (color == 0 && s == sq120(4, 0)) {
            if ((pos.castling & 1) && pos.board[sq120(5, 0)] == EMPTY &&
                pos.board[sq120(6, 0)] == EMPTY &&
                !square_attacked(pos, s, 1) &&
                !square_attacked(pos, sq120(5, 0), 1) &&
                !square_attacked(pos, sq120(6, 0), 1))
              out.push_back({s, s + 2, 0, false, true});
            if ((pos.castling & 2) && pos.board[sq120(3, 0)] == EMPTY &&
                pos.board[sq120(2, 0)] == EMPTY &&
                pos.board[sq120(1, 0)] == EMPTY &&
                !square_attacked(pos, s, 1) &&
                !square_attacked(pos, sq120(3, 0), 1) &&
                !square_attacked(pos, sq120(2, 0), 1))
              out.push_back({s, s - 2, 0, false, true});
          } else if (color == 1 && s == sq120(4, 7)) {
            if ((pos.castling & 4) && pos.board[sq120(5, 7)] == EMPTY &&
                pos.board[sq120(6, 7)] == EMPTY &&
                !square_attacked(pos, s, 0) &&
                !square_attacked(pos, sq120(5, 7), 0) &&
                !square_attacked(pos, sq120(6, 7), 0))
              out.push_back({s, s + 2, 0, false, true});
            if ((pos.castling & 8) && pos.board[sq120(3, 7)] == EMPTY &&
                pos.board[sq120(2, 7)] == EMPTY &&
                pos.board[sq120(1, 7)] == EMPTY &&
                !square_attacked(pos, s, 0) &&
                !square_attacked(pos, sq120(3, 7), 0) &&
                !square_attacked(pos, sq120(2, 7), 0))
              out.push_back({s, s - 2, 0, false, true});
          }
          break;
        default: {  // sliders
          const int* dirs = type_of(pc) == 3 ? BISHOP_D
                           : type_of(pc) == 4 ? ROOK_D : nullptr;
          int ndirs = 4;
          int alldirs[8];
          if (type_of(pc) == 5) {  // queen
            memcpy(alldirs, BISHOP_D, sizeof(BISHOP_D));
            memcpy(alldirs + 4, ROOK_D, sizeof(ROOK_D));
            dirs = alldirs;
            ndirs = 8;
          }
          for (int i = 0; i < ndirs; i++) {
            t = s + dirs[i];
            while (pos.board[t] != OFFBOARD) {
              int8_t cap = pos.board[t];
              if (cap == EMPTY) out.push_back({s, t, 0, false, false});
              else {
                if (color_of(cap) != color)
                  out.push_back({s, t, 0, false, false});
                break;
              }
              t += dirs[i];
            }
          }
        }
      }
    }
}

void gen_legal(const Position& pos, std::vector<Move>& out) {
  std::vector<Move> pseudo;
  gen_pseudo(pos, pseudo);
  for (const Move& m : pseudo) {
    Position next = pos;
    make_move(next, m);
    if (!in_check(next, pos.side)) out.push_back(m);
  }
}

// ---------- SAN ----------

void sq_name(int s, char* out) {
  out[0] = (char)('a' + file_of120(s));
  out[1] = (char)('1' + rank_of120(s));
  out[2] = 0;
}

std::string san_for_move(const Position& pos, const Move& m,
                         const std::vector<Move>& legal) {
  std::string san;
  int8_t pc = pos.board[m.from];
  int t = type_of(pc);
  char from_name[3], to_name[3];
  sq_name(m.from, from_name);
  sq_name(m.to, to_name);
  bool capture = pos.board[m.to] != EMPTY || m.is_ep;

  if (m.is_castle) {
    san = (m.to > m.from) ? "O-O" : "O-O-O";
  } else if (t == 1) {
    if (capture) { san += from_name[0]; san += 'x'; }
    san += to_name;
    if (m.promo) { san += '='; san += "  NBRQ"[m.promo]; }
  } else {
    san += " PNBRQK"[t];
    // disambiguation among same-type pieces reaching the same target
    bool need_file = false, need_rank = false, ambiguous = false;
    for (const Move& o : legal) {
      if (o.from == m.from || o.to != m.to) continue;
      if (type_of(pos.board[o.from]) != t) continue;
      ambiguous = true;
      if (file_of120(o.from) == file_of120(m.from)) need_rank = true;
      else need_file = true;
    }
    if (ambiguous && !need_file && !need_rank) need_file = true;
    if (need_file) san += from_name[0];
    if (need_rank) san += from_name[1];
    if (capture) san += 'x';
    san += to_name;
  }

  Position next = pos;
  make_move(next, m);
  if (in_check(next, next.side)) {
    std::vector<Move> replies;
    gen_legal(next, replies);
    san += replies.empty() ? '#' : '+';
  }
  return san;
}

bool parse_san(const Position& pos, const char* san, Move& out) {
  std::vector<Move> legal;
  gen_legal(pos, legal);
  // strip decorations for comparison
  auto canon = [](const std::string& s) {
    std::string r;
    for (char c : s)
      if (c != '+' && c != '#' && c != '!' && c != '?') r += c;
    return r;
  };
  std::string target = canon(san);
  for (const Move& m : legal) {
    if (canon(san_for_move(pos, m, legal)) == target) { out = m; return true; }
  }
  return false;
}

// ---------- game state ----------

enum GameState {
  ONGOING = 0,
  CHECKMATE = 1,    // side to move is mated
  STALEMATE = 2,
  DRAW_50 = 3,
  DRAW_MATERIAL = 4,
};

bool insufficient_material(const Position& pos) {
  int minor[2] = {0, 0};
  for (int r = 0; r < 8; r++)
    for (int f = 0; f < 8; f++) {
      int8_t pc = pos.board[sq120(f, r)];
      if (pc == EMPTY) continue;
      int t = type_of(pc);
      if (t == 1 || t == 4 || t == 5) return false;  // pawn/rook/queen
      if (t == 2 || t == 3) minor[color_of(pc)]++;
    }
  return minor[0] <= 1 && minor[1] <= 1;
}

int game_state(const Position& pos) {
  std::vector<Move> legal;
  gen_legal(pos, legal);
  if (legal.empty())
    return in_check(pos, pos.side) ? CHECKMATE : STALEMATE;
  // auto-draw at the 75-move rule (halfmove 150), matching python-chess
  // Board.is_game_over() semantics the reference env relies on
  // (chess/env/env.py:122); the 50-move rule is claimable, not automatic.
  if (pos.halfmove >= 150) return DRAW_50;
  if (insufficient_material(pos)) return DRAW_MATERIAL;
  return ONGOING;
}

// ---------- zobrist ----------

uint64_t zobrist_table[120][13];
uint64_t zobrist_side, zobrist_castle[16], zobrist_ep[120];
bool zobrist_ready = false;

uint64_t splitmix64(uint64_t& x) {
  x += 0x9e3779b97f4a7c15ULL;
  uint64_t z = x;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

void init_zobrist() {
  if (zobrist_ready) return;
  uint64_t seed = 0x123456789abcdefULL;
  for (int s = 0; s < 120; s++)
    for (int p = 0; p < 13; p++) zobrist_table[s][p] = splitmix64(seed);
  zobrist_side = splitmix64(seed);
  for (int i = 0; i < 16; i++) zobrist_castle[i] = splitmix64(seed);
  for (int s = 0; s < 120; s++) zobrist_ep[s] = splitmix64(seed);
  zobrist_ready = true;
}

uint64_t zobrist(const Position& pos) {
  init_zobrist();
  uint64_t h = 0;
  for (int r = 0; r < 8; r++)
    for (int f = 0; f < 8; f++) {
      int s = sq120(f, r);
      if (pos.board[s] > EMPTY) h ^= zobrist_table[s][pos.board[s]];
    }
  if (pos.side) h ^= zobrist_side;
  h ^= zobrist_castle[pos.castling];
  if (pos.ep >= 0) h ^= zobrist_ep[pos.ep];
  return h;
}

// ---------- search ----------

const int PIECE_VALUE[7] = {0, 100, 320, 330, 500, 900, 20000};

// piece-square tables (white perspective, a1 = idx 0)
const int PST_PAWN[64] = {
   0,  0,  0,  0,  0,  0,  0,  0,
   5, 10, 10,-20,-20, 10, 10,  5,
   5, -5,-10,  0,  0,-10, -5,  5,
   0,  0,  0, 20, 20,  0,  0,  0,
   5,  5, 10, 25, 25, 10,  5,  5,
  10, 10, 20, 30, 30, 20, 10, 10,
  50, 50, 50, 50, 50, 50, 50, 50,
   0,  0,  0,  0,  0,  0,  0,  0};
const int PST_KNIGHT[64] = {
 -50,-40,-30,-30,-30,-30,-40,-50,
 -40,-20,  0,  5,  5,  0,-20,-40,
 -30,  5, 10, 15, 15, 10,  5,-30,
 -30,  0, 15, 20, 20, 15,  0,-30,
 -30,  5, 15, 20, 20, 15,  5,-30,
 -30,  0, 10, 15, 15, 10,  0,-30,
 -40,-20,  0,  0,  0,  0,-20,-40,
 -50,-40,-30,-30,-30,-30,-40,-50};
const int PST_KING[64] = {
  20, 30, 10,  0,  0, 10, 30, 20,
  20, 20,  0,  0,  0,  0, 20, 20,
 -10,-20,-20,-20,-20,-20,-20,-10,
 -20,-30,-30,-40,-40,-30,-30,-20,
 -30,-40,-40,-50,-50,-40,-40,-30,
 -30,-40,-40,-50,-50,-40,-40,-30,
 -30,-40,-40,-50,-50,-40,-40,-30,
 -30,-40,-40,-50,-50,-40,-40,-30};
const int PST_KING_END[64] = {
 -50,-30,-30,-30,-30,-30,-30,-50,
 -30,-30,  0,  0,  0,  0,-30,-30,
 -30,-10, 20, 30, 30, 20,-10,-30,
 -30,-10, 30, 40, 40, 30,-10,-30,
 -30,-10, 30, 40, 40, 30,-10,-30,
 -30,-10, 20, 30, 30, 20,-10,-30,
 -30,-20,-10,  0,  0,-10,-20,-30,
 -50,-40,-30,-20,-20,-30,-40,-50};

int sq64(int s120) { return file_of120(s120) + 8 * rank_of120(s120); }

struct SearchCtx {
  long nodes;
  long node_budget;
  int noise;           // max centipawn eval noise (strength limiter)
  uint64_t rng_state;
  bool aborted;
};

int rand_noise(SearchCtx& ctx) {
  if (!ctx.noise) return 0;
  uint64_t z = splitmix64(ctx.rng_state);
  return (int)(z % (2 * ctx.noise + 1)) - ctx.noise;
}

int evaluate(const Position& pos, SearchCtx& ctx) {
  int score = 0;
  int phase = 0;  // count non-pawn material to pick king PST
  for (int r = 0; r < 8; r++)
    for (int f = 0; f < 8; f++) {
      int8_t pc = pos.board[sq120(f, r)];
      if (pc == EMPTY) continue;
      int t = type_of(pc);
      if (t != 1 && t != 6) phase += PIECE_VALUE[t];
    }
  bool endgame = phase < 1300;
  for (int r = 0; r < 8; r++)
    for (int f = 0; f < 8; f++) {
      int s = sq120(f, r);
      int8_t pc = pos.board[s];
      if (pc == EMPTY) continue;
      int t = type_of(pc);
      int c = color_of(pc);
      int idx = c == 0 ? sq64(s) : (63 - sq64(s));
      int v = PIECE_VALUE[t];
      switch (t) {
        case 1: v += PST_PAWN[idx]; break;
        case 2: v += PST_KNIGHT[idx]; break;
        case 3: v += PST_KNIGHT[idx] / 2 + 10; break;
        case 4: v += 0; break;
        case 5: v += 0; break;
        case 6: v += endgame ? PST_KING_END[idx] : PST_KING[idx]; break;
      }
      score += c == 0 ? v : -v;
    }
  int rel = pos.side == 0 ? score : -score;
  return rel + rand_noise(ctx);
}

const int INF = 1000000, MATE = 100000;

int quiesce(Position& pos, int alpha, int beta, SearchCtx& ctx) {
  if (++ctx.nodes > ctx.node_budget) { ctx.aborted = true; return alpha; }
  int stand = evaluate(pos, ctx);
  if (stand >= beta) return beta;
  if (stand > alpha) alpha = stand;
  std::vector<Move> moves;
  gen_legal(pos, moves);
  for (const Move& m : moves) {
    bool capture = pos.board[m.to] != EMPTY || m.is_ep;
    if (!capture) continue;
    Position next = pos;
    make_move(next, m);
    int score = -quiesce(next, -beta, -alpha, ctx);
    if (ctx.aborted) return alpha;
    if (score >= beta) return beta;
    if (score > alpha) alpha = score;
  }
  return alpha;
}

int alphabeta(Position& pos, int depth, int alpha, int beta, SearchCtx& ctx) {
  if (ctx.aborted) return alpha;
  if (depth == 0) return quiesce(pos, alpha, beta, ctx);
  if (++ctx.nodes > ctx.node_budget) { ctx.aborted = true; return alpha; }

  std::vector<Move> moves;
  gen_legal(pos, moves);
  if (moves.empty())
    return in_check(pos, pos.side) ? -MATE + (100 - depth) : 0;
  if (pos.halfmove >= 150 || insufficient_material(pos)) return 0;

  // order: captures first (MVV)
  std::stable_sort(moves.begin(), moves.end(), [&](const Move& a, const Move& b) {
    int va = a.is_ep ? 100 : (pos.board[a.to] != EMPTY ? PIECE_VALUE[type_of(pos.board[a.to])] : 0);
    int vb = b.is_ep ? 100 : (pos.board[b.to] != EMPTY ? PIECE_VALUE[type_of(pos.board[b.to])] : 0);
    return va > vb;
  });

  for (const Move& m : moves) {
    Position next = pos;
    make_move(next, m);
    int score = -alphabeta(next, depth - 1, -beta, -alpha, ctx);
    if (ctx.aborted) return alpha;
    if (score >= beta) return beta;
    if (score > alpha) alpha = score;
  }
  return alpha;
}

bool search_best(const Position& pos, int max_depth, long node_budget,
                 int noise, uint64_t seed, Move& best) {
  std::vector<Move> moves;
  gen_legal(pos, moves);
  if (moves.empty()) return false;

  SearchCtx ctx{0, node_budget, noise, seed ^ 0xdeadbeefULL, false};
  best = moves[0];
  for (int depth = 1; depth <= max_depth && !ctx.aborted; depth++) {
    int alpha = -INF;
    Move iter_best = best;
    for (const Move& m : moves) {
      Position next = pos;
      make_move(next, m);
      int score = -alphabeta(next, depth - 1, -alpha - 1000000, -alpha, ctx);
      if (ctx.aborted) break;
      if (score > alpha) { alpha = score; iter_best = m; }
    }
    if (!ctx.aborted) best = iter_best;
  }
  return true;
}

}  // namespace

// ---------- C API ----------

extern "C" {

// returns 1 if fen is valid
int cc_validate_fen(const char* fen) {
  Position pos;
  return parse_fen(fen, pos) ? 1 : 0;
}

// legal moves as space-separated SAN into out (size out_size); returns count
int cc_legal_moves(const char* fen, char* out, int out_size) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  std::vector<Move> legal;
  gen_legal(pos, legal);
  std::string all;
  for (const Move& m : legal) {
    if (!all.empty()) all += ' ';
    all += san_for_move(pos, m, legal);
  }
  if ((int)all.size() + 1 > out_size) return -2;
  strcpy(out, all.c_str());
  return (int)legal.size();
}

// apply SAN move; writes new FEN to out_fen. returns 0 ok, -1 bad fen,
// -2 illegal/unparseable san
int cc_push_san(const char* fen, const char* san, char* out_fen) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  Move m;
  if (!parse_san(pos, san, m)) return -2;
  make_move(pos, m);
  format_fen(pos, out_fen);
  return 0;
}

// game state of the position (see GameState enum)
int cc_game_state(const char* fen) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  return game_state(pos);
}

// side to move in check?
int cc_in_check(const char* fen) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  return in_check(pos, pos.side) ? 1 : 0;
}

uint64_t cc_zobrist(const char* fen) {
  Position pos;
  if (!parse_fen(fen, pos)) return 0;
  return zobrist(pos);
}

// engine move as SAN. elo in [600, 2400] maps to depth/noise handicap
// (stand-in for the reference's Stockfish UCI_Elo 1200 opponent).
// returns 0 ok, -1 bad fen, -2 no legal moves
int cc_best_move(const char* fen, int elo, long node_budget, uint64_t seed,
                 char* out_san, int out_size) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  int depth, noise;
  if (elo >= 2200) { depth = 7; noise = 0; }
  else if (elo >= 1800) { depth = 5; noise = 15; }
  else if (elo >= 1400) { depth = 4; noise = 40; }
  else if (elo >= 1000) { depth = 3; noise = 80; }
  else { depth = 2; noise = 150; }
  if (node_budget <= 0) node_budget = 200000;
  Move best;
  if (!search_best(pos, depth, node_budget, noise, seed, best)) return -2;
  std::vector<Move> legal;
  gen_legal(pos, legal);
  std::string san = san_for_move(pos, best, legal);
  if ((int)san.size() + 1 > out_size) return -3;
  strcpy(out_san, san.c_str());
  return 0;
}

// uniformly random legal move
int cc_random_move(const char* fen, uint64_t seed, char* out_san, int out_size) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  std::vector<Move> legal;
  gen_legal(pos, legal);
  if (legal.empty()) return -2;
  uint64_t s = seed ^ 0xabcdef123ULL;
  uint64_t z = splitmix64(s);
  const Move& m = legal[z % legal.size()];
  std::string san = san_for_move(pos, m, legal);
  if ((int)san.size() + 1 > out_size) return -3;
  strcpy(out_san, san.c_str());
  return 0;
}

// batched step: for each board i, try to push san[i]; writes result fen,
// legality flag, and the resulting game state. One ctypes crossing for a
// whole vectorized-env batch.
// fens/sans: arrays of char* (n entries). out_fens: preallocated char
// buffers of fen_size each. out_legal/out_state: int arrays.
void cc_batch_push_san(int n, const char** fens, const char** sans,
                       char** out_fens, int fen_size, int* out_legal,
                       int* out_state) {
  for (int i = 0; i < n; i++) {
    Position pos;
    if (!parse_fen(fens[i], pos)) {
      out_legal[i] = 0;
      out_state[i] = -1;
      snprintf(out_fens[i], fen_size, "%s", fens[i]);
      continue;
    }
    Move m;
    if (!parse_san(pos, sans[i], m)) {
      out_legal[i] = 0;
      out_state[i] = game_state(pos);
      snprintf(out_fens[i], fen_size, "%s", fens[i]);
      continue;
    }
    make_move(pos, m);
    format_fen(pos, out_fens[i]);
    out_legal[i] = 1;
    out_state[i] = game_state(pos);
  }
}

// batched engine replies
void cc_batch_best_move(int n, const char** fens, int elo, long node_budget,
                        uint64_t seed, char** out_sans, int san_size,
                        int* out_ok) {
  for (int i = 0; i < n; i++) {
    out_ok[i] = cc_best_move(fens[i], elo, node_budget, seed + i, out_sans[i], san_size);
  }
}

// perft for rules validation
long cc_perft(const char* fen, int depth) {
  Position pos;
  if (!parse_fen(fen, pos)) return -1;
  struct Rec {
    static long go(const Position& p, int d) {
      if (d == 0) return 1;
      std::vector<Move> legal;
      gen_legal(p, legal);
      if (d == 1) return (long)legal.size();
      long total = 0;
      for (const Move& m : legal) {
        Position next = p;
        make_move(next, m);
        total += go(next, d - 1);
      }
      return total;
    }
  };
  return Rec::go(pos, depth);
}

}  // extern "C"
