/* Text-SAM implementation of the htslib subset FEM uses (see sam.h in
 * this directory). Rendering matches htslib sam_format1 for every field
 * the reference sets in /root/reference/src/align.c:546-632.
 */
#include "htslib/sam.h"

#include <limits.h>

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

/* htslib's seq_nt16_table: char -> 4-bit nt16 code (htslib/hts.c). */
const unsigned char seq_nt16_table[256] = {
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
     1,  2,  4,  8, 15, 15, 15, 15, 15, 15, 15, 15, 15,  0 /*=*/, 15, 15,
    15,  1, 14,  2, 13, 15, 15,  4, 11, 15, 15, 12, 15,  3, 15, 15,
    15, 15,  5,  6,  8, 15,  7,  9, 15, 10, 15, 15, 15, 15, 15, 15,
    15,  1, 14,  2, 13, 15, 15,  4, 11, 15, 15, 12, 15,  3, 15, 15,
    15, 15,  5,  6,  8, 15,  7,  9, 15, 10, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15};

samFile *sam_open_format(const char *fn, const char *mode,
                         const htsFormat *fmt) {
    (void)fmt;
    if (!mode || mode[0] != 'w') return NULL; /* write-only stub */
    FILE *fp = strcmp(fn, "-") ? fopen(fn, "w") : stdout;
    if (!fp) return NULL;
    samFile *s = (samFile *)calloc(1, sizeof(samFile));
    s->fp = fp;
    return s;
}

int sam_close(samFile *fp) {
    if (!fp) return -1;
    int rc = (fp->fp && fp->fp != stdout) ? fclose(fp->fp) : fflush(fp->fp);
    free(fp);
    return rc;
}

sam_hdr_t *sam_hdr_init(void) {
    return (sam_hdr_t *)calloc(1, sizeof(sam_hdr_t));
}

void sam_hdr_destroy(sam_hdr_t *h) {
    if (!h) return;
    free(h->target_len);
    free(h->target_name);
    free(h->text);
    free(h);
}

int sam_hdr_write(samFile *fp, const sam_hdr_t *h) {
    /* htslib writes h->text verbatim for text SAM (appending a newline
     * only when missing; FEM's text always ends in one). */
    if (!fp || !h) return -1;
    if (h->l_text && fwrite(h->text, 1, h->l_text, fp->fp) != h->l_text)
        return -1;
    if (h->l_text && h->text[h->l_text - 1] != '\n') fputc('\n', fp->fp);
    return 0;
}

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b) {
    if (!b) return;
    free(b->data);
    free(b);
}

static int bam_grow(bam1_t *b, int need) {
    if ((uint32_t)need <= b->m_data) return 0;
    uint32_t m = b->m_data ? b->m_data : 32;
    while (m < (uint32_t)need) m <<= 1;
    uint8_t *d = (uint8_t *)realloc(b->data, m);
    if (!d) return -1;
    b->data = d;
    b->m_data = m;
    return 0;
}

static uint8_t *aux_find(bam1_t *b, const char tag[2], uint8_t **end_out) {
    uint8_t *p = bam_get_aux(b);
    uint8_t *end = b->data + b->l_data;
    *end_out = end;
    while (p + 3 <= end) {
        if (p[0] == (uint8_t)tag[0] && p[1] == (uint8_t)tag[1]) return p;
        uint8_t type = p[2];
        p += 3;
        switch (type) {
            case 'A': case 'c': case 'C': p += 1; break;
            case 's': case 'S': p += 2; break;
            case 'i': case 'I': case 'f': p += 4; break;
            case 'd': p += 8; break;
            case 'Z': case 'H':
                while (p < end && *p) p++;
                p++;
                break;
            default: return NULL; /* unsupported in stub */
        }
    }
    return NULL;
}

static void aux_remove(bam1_t *b, uint8_t *p) {
    uint8_t type = p[2];
    uint8_t *q = p + 3;
    switch (type) {
        case 'A': case 'c': case 'C': q += 1; break;
        case 's': case 'S': q += 2; break;
        case 'i': case 'I': case 'f': q += 4; break;
        case 'd': q += 8; break;
        case 'Z': case 'H':
            while (q < b->data + b->l_data && *q) q++;
            q++;
            break;
        default: break;
    }
    memmove(p, q, (b->data + b->l_data) - q);
    b->l_data -= (int)(q - p);
}

int bam_aux_update_int(bam1_t *b, const char tag[2], int64_t val) {
    /* htslib picks the narrowest BAM integer type (sam.c). */
    uint8_t *end, *old = aux_find(b, tag, &end);
    if (old) aux_remove(b, old);
    uint8_t buf[11];
    int n = 0;
    buf[n++] = tag[0];
    buf[n++] = tag[1];
    if (val < INT32_MIN || val > (int64_t)UINT32_MAX) return -1;
    if (val < 0) {
        if (val >= INT8_MIN) {
            buf[n++] = 'c';
            buf[n++] = (uint8_t)val;
        } else if (val >= INT16_MIN) {
            buf[n++] = 's';
            int16_t v = (int16_t)val;
            memcpy(buf + n, &v, 2);
            n += 2;
        } else {
            buf[n++] = 'i';
            int32_t v = (int32_t)val;
            memcpy(buf + n, &v, 4);
            n += 4;
        }
    } else if (val <= UCHAR_MAX) {
        buf[n++] = 'C';
        buf[n++] = (uint8_t)val;
    } else if (val <= USHRT_MAX) {
        buf[n++] = 'S';
        uint16_t v = (uint16_t)val;
        memcpy(buf + n, &v, 2);
        n += 2;
    } else if (val <= (int64_t)UINT_MAX) {
        buf[n++] = 'I';
        uint32_t v = (uint32_t)val;
        memcpy(buf + n, &v, 4);
        n += 4;
    }
    if (bam_grow(b, b->l_data + n) < 0) return -1;
    memcpy(b->data + b->l_data, buf, n);
    b->l_data += n;
    return 0;
}

int bam_aux_update_str(bam1_t *b, const char tag[2], int len,
                       const char *data) {
    /* len includes the trailing NUL (htslib requires NUL-terminated). */
    uint8_t *end, *old = aux_find(b, tag, &end);
    if (old) aux_remove(b, old);
    if (len < 1 || data[len - 1] != '\0') return -1;
    if (bam_grow(b, b->l_data + 3 + len) < 0) return -1;
    uint8_t *p = b->data + b->l_data;
    p[0] = tag[0];
    p[1] = tag[1];
    p[2] = 'Z';
    memcpy(p + 3, data, len);
    b->l_data += 3 + len;
    return 0;
}

/* --- record rendering (htslib sam_format1 text path) --- */

typedef struct {
    char *s;
    size_t l, m;
} sbuf_t;

static void sb_need(sbuf_t *k, size_t extra) {
    if (k->l + extra + 1 > k->m) {
        size_t m = k->m ? k->m : 256;
        while (m < k->l + extra + 1) m <<= 1;
        k->s = (char *)realloc(k->s, m);
        k->m = m;
    }
}

static void sb_putsn(sbuf_t *k, const char *s, size_t n) {
    sb_need(k, n);
    memcpy(k->s + k->l, s, n);
    k->l += n;
}

static void sb_putc(sbuf_t *k, char c) {
    sb_need(k, 1);
    k->s[k->l++] = c;
}

static void sb_putll(sbuf_t *k, long long v) {
    char tmp[24];
    int n = snprintf(tmp, sizeof tmp, "%lld", v);
    sb_putsn(k, tmp, (size_t)n);
}

int sam_write1(samFile *fp, const sam_hdr_t *h, const bam1_t *b) {
    static sbuf_t k; /* single writer thread in FEM (output_queue.c:60) */
    k.l = 0;
    const bam1_core_t *c = &b->core;
    sb_putsn(&k, bam_get_qname(b), strlen(bam_get_qname(b)));
    sb_putc(&k, '\t');
    sb_putll(&k, c->flag);
    sb_putc(&k, '\t');
    if (c->tid >= 0 && c->tid < h->n_targets)
        sb_putsn(&k, h->target_name[c->tid], strlen(h->target_name[c->tid]));
    else
        sb_putc(&k, '*');
    sb_putc(&k, '\t');
    sb_putll(&k, (long long)c->pos + 1);
    sb_putc(&k, '\t');
    sb_putll(&k, c->qual);
    sb_putc(&k, '\t');
    if (c->n_cigar) {
        const uint32_t *cig = bam_get_cigar(b);
        for (uint32_t i = 0; i < c->n_cigar; ++i) {
            sb_putll(&k, bam_cigar_oplen(cig[i]));
            sb_putc(&k, bam_cigar_opchr(cig[i]));
        }
    } else {
        sb_putc(&k, '*');
    }
    sb_putc(&k, '\t');
    if (c->mtid < 0)
        sb_putc(&k, '*');
    else if (c->mtid == c->tid)
        sb_putc(&k, '=');
    else
        sb_putsn(&k, h->target_name[c->mtid], strlen(h->target_name[c->mtid]));
    sb_putc(&k, '\t');
    sb_putll(&k, (long long)c->mpos + 1);
    sb_putc(&k, '\t');
    sb_putll(&k, (long long)c->isize);
    sb_putc(&k, '\t');
    if (c->l_qseq) {
        const uint8_t *seq = bam_get_seq(b);
        sb_need(&k, (size_t)c->l_qseq);
        for (int32_t i = 0; i < c->l_qseq; ++i)
            k.s[k.l++] = seq_nt16_str[bam_seqi(seq, i)];
        sb_putc(&k, '\t');
        const uint8_t *qual = bam_get_qual(b);
        if (qual[0] == 0xff) {
            sb_putc(&k, '*');
        } else {
            sb_need(&k, (size_t)c->l_qseq);
            for (int32_t i = 0; i < c->l_qseq; ++i)
                k.s[k.l++] = (char)(qual[i] + 33);
        }
    } else {
        sb_putsn(&k, "*\t*", 3);
    }
    /* aux tags */
    const uint8_t *p = bam_get_aux(b);
    const uint8_t *end = b->data + b->l_data;
    while (p + 3 <= end) {
        sb_putc(&k, '\t');
        sb_putc(&k, (char)p[0]);
        sb_putc(&k, (char)p[1]);
        sb_putc(&k, ':');
        uint8_t type = p[2];
        p += 3;
        switch (type) {
            case 'A':
                sb_putsn(&k, "A:", 2);
                sb_putc(&k, (char)*p++);
                break;
            case 'C':
                sb_putsn(&k, "i:", 2);
                sb_putll(&k, *p++);
                break;
            case 'c':
                sb_putsn(&k, "i:", 2);
                sb_putll(&k, *(int8_t *)p++);
                break;
            case 'S': {
                uint16_t v;
                memcpy(&v, p, 2);
                p += 2;
                sb_putsn(&k, "i:", 2);
                sb_putll(&k, v);
                break;
            }
            case 's': {
                int16_t v;
                memcpy(&v, p, 2);
                p += 2;
                sb_putsn(&k, "i:", 2);
                sb_putll(&k, v);
                break;
            }
            case 'I': {
                uint32_t v;
                memcpy(&v, p, 4);
                p += 4;
                sb_putsn(&k, "i:", 2);
                sb_putll(&k, v);
                break;
            }
            case 'i': {
                int32_t v;
                memcpy(&v, p, 4);
                p += 4;
                sb_putsn(&k, "i:", 2);
                sb_putll(&k, v);
                break;
            }
            case 'Z': {
                sb_putc(&k, 'Z');
                sb_putc(&k, ':');
                while (p < end && *p) sb_putc(&k, (char)*p++);
                p++;
                break;
            }
            default:
                return -1; /* unsupported in stub */
        }
    }
    sb_putc(&k, '\n');
    if (fwrite(k.s, 1, k.l, fp->fp) != k.l) return -1;
    return (int)k.l;
}
